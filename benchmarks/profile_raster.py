"""Roofline + trace capture for the full-obs (BEV image + RS) rollout — the
configuration the flagship training uses, and the slowest bench variant.

Round-3 verdict: img_and_rs_on ran at ~140k env-steps/s (5x below obs-only),
dominated by the rasterizer.  This script measures (a) the per-step XLA cost
model of the full-obs batched step (flops / HBM bytes -> roofline position
against v5e peaks), (b) the isolated rasterizer before/after the round-4
ego-frame reformulation (``render_bev`` vs ``render_bev_oracle``), and (c)
captures a jax.profiler trace of the steady-state rollout.

Usage: python benchmarks/profile_raster.py [--trace runlogs/trace_imgrs]
Prints one JSON object.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hope_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax                    # noqa: E402
import jax.numpy as jnp       # noqa: E402

from hope_tpu.config import EnvConfig, ObsConfig, VehicleConfig  # noqa: E402
from hope_tpu.envs import ParkingEnv                              # noqa: E402
from hope_tpu.envs.scenario_gen import generate_bank              # noqa: E402
from hope_tpu.geometry import pose_to_box                         # noqa: E402
from hope_tpu.geometry.raster import render_bev, render_bev_oracle  # noqa: E402
from hope_tpu.utils.profiling import compiled_cost, time_fn, trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()
    B = args.batch

    obs_cfg = ObsConfig(use_img=True)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96, max_obstacles=32)
    env = ParkingEnv(env_cfg)
    vcfg = env_cfg.vehicle
    key = jax.random.PRNGKey(0)
    scenes, _ = generate_bank(key, level="Normal", n=B)
    state, obs = env.batch_reset(scenes)
    corners = jnp.asarray(vcfg.box_corners())

    out = {}

    # (b) isolated rasterizer: new ego-frame vs world-frame oracle
    poses = jnp.stack([state.vehicle.x, state.vehicle.y,
                       state.vehicle.heading], -1)
    vboxes = jax.vmap(lambda p: pose_to_box(p, corners))(poses)

    def raster_batch(fn):
        f = jax.jit(jax.vmap(
            lambda p, vb, db, e, m, ep: fn(p, vb, db, e, m, ep,
                                           obs_cfg, vcfg)))
        return f, (poses, vboxes, scenes.dest_box, scenes.edges,
                   scenes.edge_mask, scenes.edge_poly)

    for name, fn in [("raster_ego", render_bev),
                     ("raster_world_oracle", render_bev_oracle)]:
        f, a = raster_batch(fn)
        t = time_fn(f, *a, warmup=2, iters=20)
        out[name] = {"ms_per_batch": round(t["mean_ms"], 3),
                     "renders_per_sec": round(B * t["calls_per_sec"], 1)}

    # (a) full-obs batched step roofline (20-step in-jit scan, per-step cost)
    @jax.jit
    def rollout(state, key):
        def step(st, k):
            act = jax.random.uniform(k, (B, 2), minval=-1, maxval=1)
            st, o, r, d, info = env.batch_step(
                st, env.rescale_action(act), search_rs=True)
            return st, r

        st, rs = jax.lax.scan(step, state, jax.random.split(key, 20))
        return st, rs

    cost = compiled_cost(rollout, state, jax.random.PRNGKey(1))
    out["full_obs_rollout"] = dict(
        cost,
        env_steps_per_sec=round(B * 20 / (cost["mean_ms"] / 1e3), 1),
    )

    if args.trace:
        with trace(args.trace):
            jax.block_until_ready(rollout(state, jax.random.PRNGKey(2)))
        out["trace_dir"] = args.trace

    print(json.dumps(out))


if __name__ == "__main__":
    main()
