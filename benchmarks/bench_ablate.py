"""Ablation timings for the headline rollout: bisect where the per-step time
goes (dynamics+collision / lidar / mask / action sampling / obs assembly).

Same config as bench.py (1024 scenes, 96 edges, lidar+mask obs).  Each variant
is timed as a 20-step scan; differences between variants attribute the cost.

Usage: python benchmarks/bench_ablate.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hope_tpu.config import EnvConfig, ObsConfig
from hope_tpu.envs import ParkingEnv, choose_action
from hope_tpu.envs.scenario_gen import generate_bank
from hope_tpu.utils.cache import enable_persistent_cache


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    enable_persistent_cache()
    B = 1024
    obs_cfg = ObsConfig(use_img=False)
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96, max_obstacles=32)
    env = ParkingEnv(env_cfg)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    bay, _ = generate_bank(k1, level="Normal", n=B // 2, bay_ratio=1.0)
    par, _ = generate_bank(k2, level="Normal", n=B // 2, bay_ratio=0.0)
    scenes = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), bay, par)
    state, obs = env.batch_reset(scenes)

    def make_rollout(with_transition=True, with_lidar=True, with_mask=True,
                     with_choose=True):
        @jax.jit
        def rollout(state, obs, key):
            def step(carry, k):
                state, obs = carry
                if with_choose:
                    keys = jax.random.split(k, B)
                    acts = jax.vmap(
                        lambda m, kk: choose_action(kk, jnp.zeros(2), jnp.ones(2),
                                                    m, env.mask_table)[0]
                    )(obs["action_mask"], keys)
                else:
                    acts = jax.random.uniform(k, (B, 2), minval=-1, maxval=1)
                phys = env.rescale_action(acts)
                if with_transition:
                    state, _, _, _ = jax.vmap(
                        partial(env._transition, search_rs=False))(state, phys)
                # observation pipeline, piecewise
                pose = state.vehicle.pose
                scene = state.scene
                new_obs = dict(obs)
                if with_lidar:
                    from hope_tpu.envs.lidar import lidar_observation

                    lidar = jax.vmap(
                        lambda p, e, m: lidar_observation(
                            p, e, m, env.angles, env.hull_base, env.cfg.lidar)
                    )(pose, scene.edges, scene.edge_mask)
                    new_obs["lidar"] = lidar
                else:
                    lidar = obs["lidar"]
                if with_mask:
                    from hope_tpu.envs.action_mask import postprocess
                    from hope_tpu.ops import mask_step_lengths

                    ext = (jnp.clip(lidar, 0.0, env.cfg.lidar.max_range)
                           + env.mask_table.hull_base)
                    sl = mask_step_lengths(ext, env.mask_table.dist_star,
                                           env.cfg.mask.n_iter,
                                           env.cfg.mask.upsample)
                    new_obs["action_mask"] = jax.vmap(
                        lambda s: postprocess(s, env.cfg.mask))(sl)
                new_obs["target"] = jax.vmap(env._target_repr)(pose, scene.dest)
                return (state, new_obs), ()

            (state, obs), _ = jax.lax.scan(step, (state, obs),
                                           jax.random.split(key, 20))
            return state, obs

        return rollout

    variants = {
        "full": dict(),
        "no_choose": dict(with_choose=False),
        "no_mask": dict(with_mask=False),
        "no_mask_no_choose": dict(with_mask=False, with_choose=False),
        "no_lidar_no_mask_no_choose": dict(with_lidar=False, with_mask=False,
                                           with_choose=False),
        "transition_only": dict(with_lidar=False, with_mask=False,
                                with_choose=False),
        "obs_only": dict(with_transition=False, with_choose=False),
    }
    results = {}
    for name, kw in variants.items():
        fn = make_rollout(**kw)
        dt = timed(fn, state, obs, k3)
        results[name] = {"ms_per_call": round(dt * 1e3, 2),
                         "env_steps_per_sec": round(B * 20 / dt, 1)}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
