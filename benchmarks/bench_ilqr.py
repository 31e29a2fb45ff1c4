"""Batched iLQR solver throughput: QP-backward-pass solves/s per chip.

BASELINE.json config "DLP mixed-scene batch + RS fallback + iLQR refinement":
B scenarios solve a 40-step receding-horizon refinement in lockstep; one
"solve" = one full iLQR run (n_iters backward Riccati passes + line-searched
forward passes).  Prints one JSON line.

Usage: python benchmarks/bench_ilqr.py [--batch 512] [--iters 12]
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args(argv)

    from hope_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from hope_tpu.config import EnvConfig
    from hope_tpu.envs.scenario_gen import generate_bank
    from hope_tpu.planning.ilqr import ILQRConfig, solve_batch

    B = args.batch
    cfg = ILQRConfig(horizon=args.horizon, n_iters=args.iters)
    env_cfg = EnvConfig()

    key = jax.random.PRNGKey(0)
    scenes, _ = generate_bank(key, level="Normal", n=B)
    x0 = scenes.start
    goal = scenes.dest
    us0 = jnp.zeros((B, args.horizon, 2))

    out = solve_batch(x0, goal, scenes.edges, scenes.edge_mask, us0, cfg)
    jax.block_until_ready(out.cost)
    t0 = time.perf_counter()
    n_rep = 5
    for i in range(n_rep):
        out = solve_batch(x0 + 1e-4 * i, goal, scenes.edges, scenes.edge_mask,
                          us0, cfg)
    jax.block_until_ready(out.cost)
    dt = (time.perf_counter() - t0) / n_rep

    # split p50/p99 plan latency: RS search alone, iLQR solve alone
    import numpy as np

    from hope_tpu.envs import ParkingEnv
    from hope_tpu.planning.rs_select import find_path_batch

    env = ParkingEnv(env_cfg)

    @jax.jit
    def rs_only(x0):
        return find_path_batch(x0, goal, env_cfg.vehicle.max_curvature,
                               env.corners, scenes.edges, scenes.edge_mask,
                               scenes.bounds, n_points=env_cfg.rs_max_points,
                               step_m=env_cfg.rs_step_size,
                               max_tries=env_cfg.rs_max_tries,
                               use_pallas=env._pallas_mask)

    def pct(fn, *fa, n=20):
        jax.block_until_ready(fn(*fa))
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*fa))
            ts.append(time.perf_counter() - t0)
        ts = np.asarray(ts)
        return {"p50_ms": round(float(np.percentile(ts, 50)) * 1e3, 2),
                "p99_ms": round(float(np.percentile(ts, 99)) * 1e3, 2)}

    rs_lat = pct(rs_only, x0)
    ilqr_lat = pct(lambda x: solve_batch(x, goal, scenes.edges,
                                         scenes.edge_mask, us0, cfg), x0)

    print(json.dumps({
        "metric": "ilqr_solves_per_sec_per_chip",
        "value": round(B / dt, 1),
        "unit": f"solves/s (B={B}, N={args.horizon}, {args.iters} iters, "
                f"{int(out.converged.sum())}/{B} converged)",
        "vs_baseline": None,  # no iLQR exists in the reference
        "plan_latency": {"find_path_batch": rs_lat, "solve_batch": ilqr_lat,
                         "batch": B},
    }))


if __name__ == "__main__":
    sys.exit(main())
