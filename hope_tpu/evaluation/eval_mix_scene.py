"""Mixed-scene evaluation CLI (reference evaluation/eval_mix_scene.py):
evaluates a checkpointed agent over Extrem -> dlp -> Complex -> Normal
scenario batteries and writes per-level reports.

Usage: python -m hope_tpu.evaluation.eval_mix_scene CKPT_DIR --episodes 256
       python -m hope_tpu.evaluation.eval_mix_scene random --episodes 64
         ('random' evaluates a freshly-initialized agent — useful for smoke)
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import SACAgent, PPOAgent
from ..config import EnvConfig, ObsConfig, PPOConfig, SACConfig, actor_net_config, critic_net_config
from ..envs import ParkingEnv
from ..envs.scenario_gen import generate_bank
from ..train.scene_pool import pad_scene_batch
from ..utils.checkpoint import load_checkpoint
from .evaluate import build_episode_runner, summarize, write_report


def run_battery(env, agent, state, agent_type, episodes=256, max_steps=200,
                out="log/eval", seed=0, visualize=0, include_dlp=True,
                animate=0, live=False):
    """Evaluate an in-memory agent state over the 4-level battery
    (Extrem -> dlp -> Complex -> Normal, reference eval_mix_scene.py:88-115).

    Shared by the CLI below and the trainers' ``--final-eval`` post-training
    battery (reference train_HOPE_sac.py:283-312).  Returns the per-level
    summaries; writes reports/records under ``out``.
    """
    env_cfg = env.cfg

    # PPO evals masked choose_action; SAC evals raw get_action
    # (reference eval_mix_scene.py:87, eval_utils.py:42-45)
    if agent_type == "ppo":
        policy_act = lambda obs, k: agent.choose_action(state, obs, k)  # noqa: E731
    else:
        policy_act = lambda obs, k: agent.get_action(state, obs, k)  # noqa: E731
    policy_logp = lambda obs, a: agent.log_prob(state, obs, a)  # noqa: E731

    run = build_episode_runner(env, policy_act, policy_logp, max_steps,
                               record_traj=visualize > 0 or animate > 0)
    os.makedirs(out, exist_ok=True)
    key = jax.random.PRNGKey(seed + 7)

    levels = (["Extrem", "dlp", "Complex", "Normal"] if include_dlp
              else ["Extrem", "Complex", "Normal"])
    results = {}
    for level in levels:
        key, k1, k2 = jax.random.split(key, 3)
        if level == "dlp":
            from ..envs.dlp import DLPDataset

            ds = DLPDataset(env_cfg=env_cfg)
            ids = jnp.arange(episodes) % ds.n_cases
            scenes = ds.batch_reset(jax.random.split(k1, episodes), ids)
            scenes = pad_scene_batch(scenes, env_cfg.max_edges, env_cfg.max_obstacles)
        else:
            scenes, ok = generate_bank(k1, level=level, n=episodes)
            scenes = pad_scene_batch(scenes, env_cfg.max_edges, env_cfg.max_obstacles)
        metrics = run(scenes, k2)
        metrics_np = jax.tree.map(np.asarray, metrics)
        summary = summarize(metrics_np, max_steps=max_steps)
        results[level] = summary
        write_report(os.path.join(out, f"result_{level}.json"), summary)

        from .render import save_episode_png, save_record, save_success_cdf

        save_record(os.path.join(out, f"record_{level}.npz"),
                    {k: v for k, v in metrics_np.items() if k != "poses"})
        save_success_cdf(os.path.join(out, f"success_cdf_{level}.png"),
                         metrics_np["steps"], metrics_np["success"],
                         max_steps)
        if animate:
            from .render import animate_episode

            for i in range(min(animate, episodes)):
                scene_i = jax.tree.map(lambda x: np.asarray(x)[i], scenes)
                n_steps = int(metrics_np["steps"][i])
                animate_episode(
                    os.path.join(out, f"episode_{level}_{i}.gif"),
                    scene_i, metrics_np["poses"][: max(n_steps, 1), i],
                    env.corners, live=live)
        if visualize:
            corners = env.corners
            for i in range(min(visualize, episodes)):
                scene_i = jax.tree.map(lambda x: np.asarray(x)[i], scenes)
                n_steps = int(metrics_np["steps"][i])
                save_episode_png(
                    os.path.join(out, f"episode_{level}_{i}.png"),
                    scene_i, metrics_np["poses"][: max(n_steps, 1), i], corners,
                    title=f"{level} #{i}: "
                          f"{'success' if metrics_np['success'][i] else 'fail'}"
                          f" in {n_steps} steps")
        print(json.dumps({level: summary["success_rate"],
                          "steps": summary["success_steps_mean"]}), flush=True)

    write_report(os.path.join(out, "result_all.json"), results)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", type=str)
    ap.add_argument("--episodes", type=int, default=256, help="episodes per level")
    ap.add_argument("--agent", choices=["sac", "ppo"], default=None)
    ap.add_argument("--no-img", action="store_true")
    ap.add_argument("--no-dlp", action="store_true")
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--rs-tries", type=int, default=None,
                    help="override rs_max_tries (candidate RS words "
                         "collision-checked per endgame search)")
    ap.add_argument("--out", type=str, default="log/eval")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--visualize", type=int, default=0,
                    help="render the first N episodes per level as PNGs")
    ap.add_argument("--animate", type=int, default=0,
                    help="animated GIF playback of the first N episodes per "
                         "level (the reference's pygame-window equivalent)")
    ap.add_argument("--live", action="store_true",
                    help="with --animate: also open an interactive window "
                         "(falls back to file-only when headless)")
    args = ap.parse_args(argv)

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    agent_type = args.agent or ("ppo" if "ppo" in args.ckpt.lower() else "sac")

    def cfg_from_run(cls, key):
        """Rebuild the agent config from the run's provenance file (written
        next to the ckpt dir) — optimizer-state structure depends on hparams
        like lr_decay, and a mismatched template cannot restore."""
        import dataclasses

        cfgf = os.path.join(
            os.path.dirname(os.path.abspath(args.ckpt.rstrip("/"))),
            "config.json")
        if os.path.exists(cfgf):
            with open(cfgf) as f:
                d = json.load(f).get(key)
            if d:
                fields = {f.name for f in dataclasses.fields(cls)}
                return cls(**{k: v for k, v in d.items() if k in fields})
        return cls()
    obs_cfg = ObsConfig(use_img=not args.no_img)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96 if args.no_dlp else 512,
                        max_obstacles=32 if args.no_dlp else 128,
                        **({"rs_max_tries": args.rs_tries}
                           if args.rs_tries is not None else {}))
    env = ParkingEnv(env_cfg)

    if agent_type == "sac":
        agent = SACAgent(actor_net_config(obs_cfg),
                         critic_net_config(obs_cfg, action_input=True),
                         cfg_from_run(SACConfig, "sac"), env.observation_shape,
                         env.mask_table)
    else:
        agent = PPOAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg),
                         cfg_from_run(PPOConfig, "ppo"), env.observation_shape,
                         env.mask_table)
    state = agent.init(jax.random.PRNGKey(args.seed))
    if args.ckpt != "random":
        state = load_checkpoint(args.ckpt, state)

    return run_battery(env, agent, state, agent_type,
                       episodes=args.episodes, max_steps=args.max_steps,
                       out=args.out, seed=args.seed,
                       visualize=args.visualize,
                       include_dlp=not args.no_dlp,
                       animate=args.animate, live=args.live)


if __name__ == "__main__":
    main()
