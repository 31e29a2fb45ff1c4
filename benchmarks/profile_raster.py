"""Roofline + trace capture for the full-obs (BEV image + RS) rollout — the
configuration the flagship training uses, and the slowest bench variant.

The rollout mirrors bench.py's: masked random actions DEPEND on the
observation (mask), and the scan carries the obs dict, so the rasterizer is
live computation (a rollout that ignores obs lets XLA dead-code-eliminate the
render entirely — measured 4.9 ms vs the real ~710 ms per 100-step call, a
trap this harness explicitly avoids).  Isolated single-op timings through the
axon tunnel are not trustworthy either (block_until_ready returns in ~40 us
for a 50 MB render batch); only fused-rollout A/Bs are reported — see the
"Full-obs rollout" section of BASELINE.md for the decomposition.

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

from hope_tpu.config import EnvConfig, ObsConfig  # noqa: E402
from hope_tpu.envs import ParkingEnv, choose_action  # noqa: E402
from hope_tpu.envs.scenario_gen import generate_bank  # noqa: E402
from hope_tpu.utils.profiling import compiled_cost, trace  # noqa: E402


def build_rollout(env, B, steps=100):
    @jax.jit
    def rollout(state, obs, key):
        def step(carry, k):
            state, obs = carry

            def pick(m, s, mk, kk):
                a, _ = choose_action(kk, m, s, mk, env.mask_table)
                return a

            keys = jax.random.split(k, B)
            acts = jax.vmap(pick)(jnp.zeros((B, 2)), jnp.ones((B, 2)),
                                  obs["action_mask"], keys)
            state, obs, r, done, info = env.batch_step(
                state, env.rescale_action(acts), search_rs=True)
            return (state, obs), r

        (state, obs), rs = jax.lax.scan(step, (state, obs),
                                        jax.random.split(key, steps))
        return state, obs, rs

    return rollout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()
    B, S = args.batch, args.steps

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    out = {}
    for mode in ("exact", "global"):
        obs_cfg = ObsConfig(use_img=True, raster_parity=mode)
        env_cfg = EnvConfig(obs=obs_cfg, max_edges=96, max_obstacles=32)
        env = ParkingEnv(env_cfg)
        bay, _ = generate_bank(k1, level="Normal", n=B // 2, bay_ratio=1.0)
        par, _ = generate_bank(k2, level="Normal", n=B // 2, bay_ratio=0.0)
        scenes = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), bay, par)
        state, obs = env.batch_reset(scenes)
        rollout = build_rollout(env, B, S)

        cost = compiled_cost(rollout, state, obs, k3)
        cost["env_steps_per_sec"] = round(B * S / (cost["mean_ms"] / 1e3), 1)
        out[f"full_obs_{mode}"] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in cost.items()}
        if args.trace and mode == "exact":
            with trace(args.trace):
                r = rollout(state, obs, jax.random.fold_in(k3, 9))
                jax.block_until_ready(r)
            out["trace_dir"] = args.trace

    print(json.dumps(out))


if __name__ == "__main__":
    main()
