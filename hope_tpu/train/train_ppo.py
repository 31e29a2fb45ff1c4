"""PPO training driver (reference train/train_HOPE_ppo.py): lockstep batched
on-policy collection with masked discrete action projection + hybrid RS
takeover; the buffer update fires when T x B transitions fill it
(reference :199-204).

Usage: python -m hope_tpu.train.train_ppo --episodes 2000 --batch-envs 64
       python -m hope_tpu.train.train_ppo --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import (
    HybridState,
    PPOAgent,
    hybrid_act,
    hybrid_reset_done,
    latch,
    normalize,
    norm_update,
)
from ..config import EnvConfig, ObsConfig, PPOConfig, actor_net_config, critic_net_config
from ..envs import ARRIVED, ParkingEnv
from ..utils.checkpoint import save_checkpoint
from .curriculum import LEVELS, DlpCaseChoose, SceneChoose
from .scene_pool import ScenePool


def build_collector(env: ParkingEnv, agent: PPOAgent, step_ratio: float):
    @jax.jit
    def collect_step(ppo_state, env_state, hybrid, obs, key):
        k_act = key
        B = obs["target"].shape[0]
        policy_action, policy_logp = agent.choose_action(ppo_state, obs, k_act)
        queued = hybrid.queue[jnp.arange(B), jnp.clip(hybrid.cursor, 0, hybrid.queue.shape[1] - 1)]
        queued_logp = agent.log_prob(ppo_state, obs, queued)
        action, logp, hybrid = hybrid_act(hybrid, policy_action, policy_logp, queued_logp)

        env_state, next_obs, reward, done, info = env.batch_step(
            env_state, env.rescale_action(action))

        obs_n = normalize(obs, ppo_state.norm)
        new_norm = norm_update(ppo_state.norm, next_obs)
        ppo_state = ppo_state.replace(norm=new_norm)
        next_obs_n = normalize(next_obs, new_norm)

        hybrid = latch(hybrid, info["rs"], step_ratio)
        hybrid = hybrid_reset_done(hybrid, done)

        transition = {"action": action, "reward": reward, "done": done,
                      "log_prob": logp}
        for k, v in obs_n.items():
            transition[f"obs/{k}"] = v
        for k, v in next_obs_n.items():
            transition[f"next_obs/{k}"] = v
        return ppo_state, env_state, hybrid, next_obs, done, reward, info, transition

    return collect_step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=100000)
    ap.add_argument("--batch-envs", type=int, default=64)
    ap.add_argument("--buffer-steps", type=int, default=128,
                    help="T steps per update wave (buffer = T x B)")
    ap.add_argument("--pool-per-level", type=int, default=256)
    ap.add_argument("--pool-refresh", type=int, default=200)
    ap.add_argument("--no-img", action="store_true")
    ap.add_argument("--no-dlp", action="store_true")
    ap.add_argument("--save-every", type=int, default=20)
    ap.add_argument("--log-dir", type=str, default="log/ppo")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args(argv)

    if args.smoke:
        args.episodes = 6
        args.batch_envs = 4
        args.buffer_steps = 8
        args.pool_per_level = 4
        args.no_img = True
        args.no_dlp = True

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()

    obs_cfg = ObsConfig(use_img=not args.no_img)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96 if args.no_dlp else 512,
                        max_obstacles=32 if args.no_dlp else 128)
    env = ParkingEnv(env_cfg)
    ppo_cfg = PPOConfig(mini_batch=32 if not args.smoke else 8,
                        mini_epoch=10 if not args.smoke else 2)
    agent = PPOAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg),
                     ppo_cfg, env.observation_shape, env.mask_table)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    ppo_state = agent.init(k_init)

    pool = ScenePool(env_cfg, per_level=args.pool_per_level, include_dlp=not args.no_dlp)
    scene_chooser = SceneChoose(rng=np.random.default_rng(args.seed))
    dlp_chooser = DlpCaseChoose(rng=np.random.default_rng(args.seed + 1))

    B = args.batch_envs
    n_levels = pool.n_levels
    rng = np.random.default_rng(args.seed + 2)
    env_levels = scene_chooser.choose_batch(B) % n_levels
    slots = rng.integers(0, args.pool_per_level, B)
    scenes = pool.gather(pool.flat_index(env_levels, slots))
    env_state, obs = env.batch_reset(scenes)
    hybrid = HybridState.create(B, env_cfg.rs_queue_len)

    collect = build_collector(env, agent, env_cfg.step_ratio)

    os.makedirs(args.log_dir, exist_ok=True)
    episodes_done = 0
    total_steps = 0
    wave = 0
    reward_hist = []
    t_start = time.time()

    while episodes_done < args.episodes:
        wave += 1
        transitions = []
        for _ in range(args.buffer_steps):
            key, k = jax.random.split(key)
            (ppo_state, env_state, hybrid, obs, done, reward, info,
             tr) = collect(ppo_state, env_state, hybrid, obs, k)
            transitions.append(tr)
            total_steps += B
            reward_hist.append(float(jnp.mean(reward)))

            done_np = np.asarray(done)
            if done_np.any():
                statuses = np.asarray(info["status"])
                idx = np.nonzero(done_np)[0]
                for i in idx:
                    success = int(statuses[i] == ARRIVED)
                    scene_chooser.update_success_record(success, int(env_levels[i]))
                    if LEVELS[env_levels[i]] == "dlp" and pool.dlp_case_ids is not None:
                        dlp_chooser.update_success_record(
                            success, int(pool.dlp_case_ids[slots[i]]))
                episodes_done += len(idx)
                new_levels = np.array([scene_chooser.choose_case() % n_levels for _ in idx])
                new_slots = rng.integers(0, args.pool_per_level, len(idx))
                env_levels[idx] = new_levels
                slots[idx] = new_slots
                fresh = pool.gather(pool.flat_index(new_levels, new_slots))
                f_state, f_obs = env.batch_reset(fresh)
                idx_map = np.zeros(B, np.int32)
                idx_map[idx] = np.arange(len(idx))
                expand = lambda t: jax.tree.map(lambda x: x[jnp.asarray(idx_map)], t)  # noqa: E731
                done_dev = jnp.asarray(done_np)
                env_state = ParkingEnv.reset_where(env_state, expand(f_state), done_dev)
                obs = jax.tree.map(
                    lambda a, b: jnp.where(
                        done_dev.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
                    expand(f_obs), obs)

        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *transitions)  # (T, B, ...)
        key, k = jax.random.split(key)
        ppo_state, metrics = agent.update(ppo_state, batch, k)

        sr = scene_chooser.recent_success()
        line = {
            "wave": wave, "episodes": episodes_done, "steps": total_steps,
            "reward": float(np.mean(reward_hist[-200:])),
            "success": {LEVELS[i]: float(sr[i]) for i in range(4)},
            "actor_loss": float(metrics["actor_loss"]),
            "critic_loss": float(metrics["critic_loss"]),
            "elapsed": time.time() - t_start,
        }
        print(json.dumps(line), flush=True)

        if wave % args.pool_refresh == 0:
            pool.refresh()
        if args.save_every and wave % args.save_every == 0:
            save_checkpoint(os.path.join(args.log_dir, "ckpt"), ppo_state, wave)

    save_checkpoint(os.path.join(args.log_dir, "ckpt"), ppo_state, wave)
    print(json.dumps({"final_episodes": episodes_done,
                      "steps_per_sec": total_steps / (time.time() - t_start)}))


if __name__ == "__main__":
    main()
