"""Data-parallel scaling efficiency on an N-virtual-device CPU mesh.

BASELINE.json config "PPO multi-host, gradient + QP reduction": the real
measurement needs a multi-chip slice (unavailable here — one tunneled chip),
so this harness validates the SCALING STRUCTURE the same way the driver's
multichip dry-run does: the full SAC chunk (collect + update with psum'd
gradients) sharded over a ('dp',) mesh of N virtual CPU devices, timed at
fixed per-device batch (weak scaling).  Efficiency = t(1 dev) / t(N dev) for
N x the global batch; near 1.0 means the collectives are not the bottleneck.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/bench_scaling.py [--per-device 32]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def _setup_cpu(n: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    # env vars alone are too late when sitecustomize already imported jax;
    # the config switch keeps jax.devices() from ever initializing the
    # (possibly busy) TPU tunnel backend
    import jax

    jax.config.update("jax_platforms", "cpu")


def time_chunk(n_devices: int, per_device: int, chunk_steps: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from hope_tpu.agents import HybridState, SACAgent, replay_create
    from hope_tpu.config import (EnvConfig, ObsConfig, SACConfig,
                                 actor_net_config, critic_net_config)
    from hope_tpu.envs import ParkingEnv
    from hope_tpu.envs.scenario_gen import generate_bank
    from hope_tpu.train.chunked import build_sac_chunk
    from hope_tpu.train.scene_pool import pad_scene_batch

    devices = jax.devices("cpu")[:n_devices]
    assert len(devices) == n_devices
    mesh = Mesh(np.asarray(devices), ("dp",))
    dp = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    obs_cfg = ObsConfig(use_img=False, mask_backend="xla")
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96, max_obstacles=32,
                        rs_max_points=96)
    env = ParkingEnv(env_cfg)
    agent = SACAgent(actor_net_config(obs_cfg),
                     critic_net_config(obs_cfg, action_input=True),
                     SACConfig(), env.observation_shape, env.mask_table)
    sac_state = agent.init(jax.random.PRNGKey(0))
    sac_state = jax.tree.map(lambda x: jax.device_put(x, rep), sac_state)

    B = per_device * n_devices
    pool_scenes, _ = generate_bank(jax.random.PRNGKey(1), level="Normal", n=64)
    pool = pad_scene_batch(pool_scenes, env_cfg.max_edges, env_cfg.max_obstacles)
    pool = jax.tree.map(lambda x: jax.device_put(x, rep), pool)
    pool_idx = jax.device_put(jnp.arange(B, dtype=jnp.int32) % 64, dp)
    scenes = jax.tree.map(lambda x: x[jnp.arange(B) % 64], pool)
    scenes = jax.tree.map(lambda x: jax.device_put(x, dp), scenes)
    env_state, obs = env.batch_reset(scenes)
    hybrid = jax.tree.map(lambda x: jax.device_put(x, dp),
                          HybridState.create(B, env_cfg.rs_queue_len))

    ex = {}
    for k, v in obs.items():
        ex[f"obs/{k}"] = v[0]
        ex[f"next_obs/{k}"] = v[0]
    ex["action"] = jnp.zeros(2)
    ex["reward"] = jnp.zeros(())
    ex["done"] = jnp.zeros((), bool)
    ex["log_prob"] = jnp.zeros(())
    replay = replay_create(1024 * n_devices, ex)
    replay = replay.replace(
        data=jax.tree.map(lambda x: jax.device_put(x, dp), replay.data))

    chunk = build_sac_chunk(env, agent, env_cfg.step_ratio, chunk_steps,
                            updates_per_chunk=4, sgd_batch=64 * n_devices)
    reset_queue = jax.device_put(
        jnp.arange(B * chunk_steps, dtype=jnp.int32) % 64, rep)

    args = (sac_state, env_state, hybrid, obs, pool_idx, replay)
    out = chunk(*args, pool, reset_queue, jax.random.PRNGKey(2), warmup=False)
    jax.block_until_ready(out[6]["reward"])
    args = out[:6]
    t0 = time.perf_counter()
    n_rep = 3
    for i in range(n_rep):
        out = chunk(*args, pool, reset_queue, jax.random.PRNGKey(3 + i),
                    warmup=False)
        args = out[:6]
    jax.block_until_ready(out[6]["reward"])
    return (time.perf_counter() - t0) / n_rep


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=32)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=8)
    args = ap.parse_args(argv)
    _setup_cpu(args.devices)

    t1 = time_chunk(1, args.per_device, args.chunk_steps)
    tn = time_chunk(args.devices, args.per_device, args.chunk_steps)
    n = args.devices
    # NOTE: virtual CPU devices share the host's physical cores, so perfect
    # weak scaling (tn == t1) is impossible here — this harness bounds the
    # COLLECTIVE/SHARDING overhead, not real multi-chip scaling. Report the
    # throughput gain of N-sharded work on the same silicon.
    print(json.dumps({
        "metric": "dp_sharded_throughput_gain",
        "value": round(n * t1 / tn, 3),
        "unit": f"x throughput for {n}x envs sharded over {n} virtual CPU "
                f"devices sharing one host's cores ({args.per_device} envs/dev; "
                f"upper-bounded by physical core count, NOT by collectives)",
        "t1_s": round(t1, 3),
        "tn_s": round(tn, 3),
        "weak_scaling_t1_over_tn": round(t1 / tn, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
