"""SAC training throughput: env-steps/s per chip with updates in the loop.

BASELINE.json config "SAC transformer-policy training, 1 host": B envs collect
K-step chunks with the hybrid RS gate and action-mask observations while the
twin-critic SAC update runs in-call (U SGD steps per chunk).  The reference
trains one env at a time on CPU/GPU (train_HOPE_sac.py:177-213); its replica
step rate is the bench.py numpy anchor.

Usage: python benchmarks/bench_train.py [--batch 256] [--chunk 16]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--updates-per-step", type=int, default=4)
    ap.add_argument("--sgd-batch", type=int, default=256)
    ap.add_argument("--memory", type=int, default=100_000)
    args = ap.parse_args(argv)

    from hope_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from hope_tpu.agents import HybridState, SACAgent, replay_create
    from hope_tpu.config import (EnvConfig, ObsConfig, SACConfig,
                                 actor_net_config, critic_net_config)
    from hope_tpu.envs import ParkingEnv
    from hope_tpu.envs.scenario_gen import generate_bank
    from hope_tpu.train.chunked import build_sac_chunk
    from hope_tpu.train.scene_pool import pad_scene_batch

    B, K = args.batch, args.chunk
    obs_cfg = ObsConfig(use_img=False)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96, max_obstacles=32)
    env = ParkingEnv(env_cfg)
    agent = SACAgent(actor_net_config(obs_cfg),
                     critic_net_config(obs_cfg, action_input=True),
                     SACConfig(memory_size=args.memory, batch_size=args.sgd_batch),
                     env.observation_shape, env.mask_table)
    sac_state = agent.init(jax.random.PRNGKey(0))

    pool_scenes, _ = generate_bank(jax.random.PRNGKey(1), level="Normal", n=512)
    pool = pad_scene_batch(pool_scenes, env_cfg.max_edges, env_cfg.max_obstacles)
    pool_idx = jnp.arange(B, dtype=jnp.int32) % 512
    scenes = jax.tree.map(lambda x: x[pool_idx], pool)
    env_state, obs = env.batch_reset(scenes)
    hybrid = HybridState.create(B, env_cfg.rs_queue_len)

    ex = {}
    for k, v in obs.items():
        ex[f"obs/{k}"] = v[0]
        ex[f"next_obs/{k}"] = v[0]
    ex["action"] = jnp.zeros(2)
    ex["reward"] = jnp.zeros(())
    ex["done"] = jnp.zeros((), bool)
    ex["log_prob"] = jnp.zeros(())
    replay = replay_create(args.memory, ex)

    chunk = build_sac_chunk(env, agent, env_cfg.step_ratio, K,
                            updates_per_chunk=K * args.updates_per_step,
                            sgd_batch=args.sgd_batch)
    reset_queue = jnp.arange(B * K, dtype=jnp.int32) % 512

    carry = (sac_state, env_state, hybrid, obs, pool_idx, replay)
    for i in range(2):  # compile + one-time layout costs
        out = chunk(*carry, pool, reset_queue, jax.random.PRNGKey(2 + i),
                    warmup=False)
        carry = out[:6]
    jax.block_until_ready(out[6]["reward"])
    t0 = time.perf_counter()
    n_rep = 5
    for i in range(n_rep):
        out = chunk(*carry, pool, reset_queue, jax.random.PRNGKey(10 + i),
                    warmup=False)
        carry = out[:6]
    jax.block_until_ready(out[6]["reward"])
    dt = (time.perf_counter() - t0) / n_rep

    print(json.dumps({
        "metric": "sac_train_env_steps_per_sec_per_chip",
        "value": round(B * K / dt, 1),
        "unit": f"env-steps/s while training (B={B}, K={K}, "
                f"{K * args.updates_per_step} SGD/{args.sgd_batch} per chunk, "
                f"lidar+mask obs, hybrid RS gate)",
        "sgd_steps_per_sec": round(K * args.updates_per_step / dt, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
