"""PPO training driver (reference train/train_HOPE_ppo.py): one device call
collects T lockstep steps with masked discrete action projection + hybrid RS
takeover AND runs the full-buffer PPO update (the reference's buffer-full
trigger, :199-204, becomes the chunk boundary).

Usage: python -m hope_tpu.train.train_ppo --episodes 2000 --batch-envs 64
       python -m hope_tpu.train.train_ppo --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import HybridState, PPOAgent
from ..config import EnvConfig, ObsConfig, PPOConfig, actor_net_config, critic_net_config
from ..envs import ParkingEnv
from ..utils.checkpoint import save_checkpoint
from .chunked import build_ppo_chunk, summarize_logs
from .curriculum import LEVELS, TARGET_SUCCESS, DlpCaseChoose, SceneChoose
from .scene_pool import ScenePool
from .train_sac import ResetQueueSampler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=100000)
    ap.add_argument("--batch-envs", type=int, default=64)
    ap.add_argument("--buffer-steps", type=int, default=128,
                    help="T steps per update chunk (buffer = T x B)")
    ap.add_argument("--pool-per-level", type=int, default=256)
    ap.add_argument("--pool-refresh", type=int, default=10,
                    help="refresh the scene pool every N chunks")
    ap.add_argument("--no-img", action="store_true")
    ap.add_argument("--no-dlp", action="store_true")
    ap.add_argument("--devices", type=int, default=1,
                    help="shard the env batch over a ('dp',) mesh of N "
                         "devices; counts GLOBAL devices with --num-processes")
    ap.add_argument("--coordinator", type=str, default=None,
                    help="multi-host: coordinator address host:port")
    ap.add_argument("--num-processes", type=int, default=None,
                    help="multi-host: total process count")
    ap.add_argument("--process-id", type=int, default=None,
                    help="multi-host: this process's id (0-based)")
    ap.add_argument("--lr-decay", type=str, default=None,
                    choices=["linear", "exp"],
                    help="lr schedule (reference agent_base.lr_decay :81-86)")
    ap.add_argument("--max-train-steps", type=int, default=1_000_000,
                    help="schedule horizon for --lr-decay (SGD steps)")
    ap.add_argument("--gradient-clip", action="store_true",
                    help="global-norm 0.5 clip (reference ppo_agent.py:334-336)")
    ap.add_argument("--target-kl", type=float, default=None,
                    help="KL early-stop guard per buffer pass (stabilizer "
                         "beyond the reference; e.g. 0.03)")
    ap.add_argument("--save-every", type=int, default=20)
    ap.add_argument("--log-dir", type=str, default="log/ppo")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--max-seconds", type=float, default=0.0)
    ap.add_argument("--max-chunks", type=int, default=0,
                    help="stop after N chunks (0 = episode-count only); the "
                         "deterministic stop for multi-process runs, where a "
                         "wall-clock cutoff could diverge between processes "
                         "and strand a collective")
    ap.add_argument("--resume", type=str, default=None,
                    help="orbax ckpt dir: restore the full PPOState (params, "
                         "optimizers, normalizer, counters) and continue "
                         "training")
    ap.add_argument("--final-eval", type=int, default=0,
                    help="run the 4-level eval battery with N episodes/level "
                         "after training (reference post-training eval, "
                         "train_HOPE_sac.py:283-312); 0 disables")
    ap.add_argument("--no-tensorboard", action="store_true")
    args = ap.parse_args(argv)

    if args.smoke:
        args.episodes = 6
        args.batch_envs = max(4, 2 * args.devices)
        args.buffer_steps = 8
        args.pool_per_level = 4
        args.no_img = True
        args.no_dlp = True

    # join the multi-process runtime BEFORE any device use (SURVEY.md 2b)
    from ..parallel.mesh import initialize_multihost

    initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    if not (args.num_processes and args.num_processes > 1):
        # cache off under multi-process: mixed cache-hit/fresh executables
        # carry mismatched collective-clique keys (see train_sac.py)
        from ..utils.cache import enable_persistent_cache

        enable_persistent_cache()

    obs_cfg = ObsConfig(use_img=not args.no_img)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96 if args.no_dlp else 512,
                        max_obstacles=32 if args.no_dlp else 128)
    env = ParkingEnv(env_cfg)
    ppo_cfg = PPOConfig(mini_batch=32 if not args.smoke else 8,
                        mini_epoch=10 if not args.smoke else 2,
                        lr_decay=args.lr_decay,
                        max_train_steps=args.max_train_steps,
                        gradient_clip=args.gradient_clip,
                        target_kl=args.target_kl)
    agent = PPOAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg),
                     ppo_cfg, env.observation_shape, env.mask_table)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    ppo_state = agent.init(k_init)
    if args.resume:
        from ..utils.checkpoint import load_checkpoint

        ppo_state = load_checkpoint(args.resume, ppo_state)
        print(json.dumps({"resumed": args.resume,
                          "sgd_steps": int(ppo_state.steps)}), flush=True)

    pool = ScenePool(env_cfg, per_level=args.pool_per_level, include_dlp=not args.no_dlp)
    scene_chooser = SceneChoose(rng=np.random.default_rng(args.seed))
    dlp_chooser = DlpCaseChoose(rng=np.random.default_rng(args.seed + 1))
    rng = np.random.default_rng(args.seed + 2)
    queue_sampler = ResetQueueSampler(scene_chooser, pool, rng,
                                      dlp_chooser=None if args.no_dlp else dlp_chooser)

    B = args.batch_envs
    T = args.buffer_steps
    R = B * T

    mesh = None
    if args.devices > 1:
        from ..parallel.mesh import make_mesh, replicate, shard_batch

        devs = jax.devices()
        if len(devs) < args.devices:
            raise SystemExit(
                f"--devices {args.devices}: only {len(devs)} device(s) visible")
        if B % args.devices:
            raise SystemExit("--batch-envs must be divisible by --devices")
        mesh = make_mesh(devs[: args.devices])
    multiproc = mesh is not None and jax.process_count() > 1

    start_idx = queue_sampler.sample(B)
    pool_idx = jnp.asarray(start_idx, jnp.int32)
    scenes = pool.gather(start_idx)
    if mesh is not None:
        scenes = shard_batch(scenes, mesh)
        pool_idx = shard_batch(pool_idx, mesh)
        pool.pool = replicate(pool.pool, mesh)
        ppo_state = replicate(ppo_state, mesh)
    env_state, obs = env.batch_reset(scenes)
    hybrid = HybridState.create(B, env_cfg.rs_queue_len)
    if mesh is not None:
        hybrid = shard_batch(hybrid, mesh)

    chunk_fn = build_ppo_chunk(env, agent, env_cfg.step_ratio, T)

    if multiproc:
        # AOT-compile + rendezvous before the first cross-process collective
        # (see train_sac.py for the Gloo context-deadline rationale)
        from ..parallel.mesh import barrier
        from ..parallel.mesh import replicate as _rep

        dummy_q = _rep(jnp.zeros(R, jnp.int32), mesh)
        chunk_fn.lower(ppo_state, env_state, hybrid, obs, pool_idx,
                       pool.pool, dummy_q, key).compile()
        barrier("ppo_pretrain")

    from ..utils.profiling import MetricsWriter, StepTimer

    os.makedirs(args.log_dir, exist_ok=True)
    # run provenance (reference train_HOPE_sac.py:131)
    import dataclasses
    import sys

    with open(os.path.join(args.log_dir, "config.json"), "w") as f:
        json.dump({"argv": sys.argv[1:], "args": vars(args),
                   "env": dataclasses.asdict(env_cfg),
                   "ppo": dataclasses.asdict(ppo_cfg)}, f, indent=2,
                  default=str)
    writer = MetricsWriter(args.log_dir, tensorboard=not args.no_tensorboard)
    timer = StepTimer(unit="env-steps")

    episodes_done = 0
    total_steps = 0
    n_chunk = 0
    reward_hist: list[float] = []
    best_score = (-1.0, -1.0)
    t_start = time.time()

    def _save(sub, state):
        # collective gather on EVERY process, write gated on process 0
        if multiproc:
            from ..parallel.mesh import gather_replicated

            state = jax.tree.map(np.asarray, gather_replicated(state, mesh))
            if jax.process_index() != 0:
                return
        save_checkpoint(os.path.join(args.log_dir, sub), state, n_chunk,
                        single_host=multiproc)

    while episodes_done < args.episodes:
        if args.max_seconds and time.time() - t_start > args.max_seconds:
            break
        n_chunk += 1
        reset_queue = jnp.asarray(queue_sampler.sample(R), jnp.int32)
        if mesh is not None:
            from ..parallel.mesh import replicate as _rep

            reset_queue = _rep(reset_queue, mesh)
        key, k = jax.random.split(key)
        (ppo_state, env_state, hybrid, obs, pool_idx, logs,
         metrics) = chunk_fn(ppo_state, env_state, hybrid, obs, pool_idx,
                             pool.pool, reset_queue, k)
        if multiproc:
            from ..parallel.mesh import gather_replicated

            logs = gather_replicated(logs, mesh)
        total_steps += B * T
        timer.tick(B * T)

        summary = summarize_logs(logs)
        for flat_idx, success in summary["ends"]:
            level = flat_idx // args.pool_per_level
            scene_chooser.record_episode(level, success)
            if LEVELS[level] == "dlp" and pool.dlp_case_ids is not None:
                slot = flat_idx % args.pool_per_level
                dlp_chooser.update_success_record(success, int(pool.dlp_case_ids[slot]))
        episodes_done += summary["episodes"]
        reward_hist.append(summary["reward_mean"])

        if n_chunk % args.pool_refresh == 0:
            dlp_ids = None if args.no_dlp else np.array(
                [dlp_chooser.choose_case() for _ in range(args.pool_per_level)])
            pool.refresh(dlp_case_ids=dlp_ids)
            if mesh is not None:
                from ..parallel.mesh import replicate as _rep

                pool.pool = _rep(pool.pool, mesh)

        sr = scene_chooser.recent_success()
        line = {
            "chunk": n_chunk, "episodes": episodes_done, "steps": total_steps,
            "reward": float(np.mean(reward_hist[-10:])),
            "success": {LEVELS[i]: round(float(sr[i]), 3) for i in range(4)},
            "actor_loss": round(float(metrics["actor_loss"]), 4),
            "critic_loss": round(float(metrics["critic_loss"]), 4),
            "elapsed": round(time.time() - t_start, 1),
        }
        if "approx_kl" in metrics:
            line["approx_kl"] = round(float(metrics["approx_kl"]), 5)
            line["kl_stopped"] = float(metrics["kl_stopped"])
        rate = timer.report()
        if rate and rate["unit_per_sec"]:
            line["env_steps_per_sec"] = round(rate["unit_per_sec"], 1)
        print(json.dumps(line), flush=True)
        flat = {k: v for k, v in line.items() if isinstance(v, (int, float))}
        flat.update({f"success/{k}": v for k, v in line["success"].items()})
        writer.write(n_chunk, flat)

        # lexicographic (capped mean, raw mean) best gate — see train_sac.py
        # for why neither the reference's dominance rule nor plain
        # mean-of-capped works under batched training
        capped = np.minimum(sr, TARGET_SUCCESS)
        score = (round(float(capped.mean()), 9), round(float(sr.mean()), 9))
        if (episodes_done > 100 and score > best_score
                and scene_chooser.window_counts().min() >= 50):
            best_score = score
            _save("ckpt_best", ppo_state)

        if args.save_every and n_chunk % args.save_every == 0:
            _save("ckpt", ppo_state)

        if args.max_chunks and n_chunk >= args.max_chunks:
            break

    _save("ckpt", ppo_state)
    print(json.dumps({"final_episodes": episodes_done,
                      "steps_per_sec": total_steps / (time.time() - t_start)}))

    if args.final_eval:
        from ..evaluation.eval_mix_scene import run_battery

        # collective gather on EVERY process before the process-0 gate —
        # gathering inside the gate hangs the multi-host job at exit
        ev_state = ppo_state
        if multiproc:
            from ..parallel.mesh import gather_replicated

            ev_state = jax.tree.map(np.asarray,
                                    gather_replicated(ev_state, mesh))
        if multiproc and jax.process_index() != 0:
            return
        results = run_battery(env, agent, ev_state, "ppo",
                              episodes=args.final_eval,
                              out=os.path.join(args.log_dir, "final_eval"),
                              seed=args.seed,
                              include_dlp=not args.no_dlp)
        print(json.dumps({"final_eval": {
            lv: round(r["success_rate"], 4) for lv, r in results.items()}}),
            flush=True)


if __name__ == "__main__":
    main()
