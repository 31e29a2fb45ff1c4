"""Iterate wiggle-template sweep extensions against the round-5 zero-valid
Extrem scenes (CPU).  Companion to diag_extrem_wiggle.py: evaluates candidate
parameter-sweep extensions ONLY on the scenes the committed library misses,
so a full-bank re-check is needed just once at the end.

Usage:  JAX_PLATFORMS=cpu python benchmarks/iter_extrem_templates.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from hope_tpu.config import EnvConfig, ObsConfig
from hope_tpu.envs import ParkingEnv
from hope_tpu.envs.scenario_gen import generate_bank
from hope_tpu.train.scene_pool import pad_scene_batch

from diag_extrem_wiggle import wiggle_validity  # noqa: E402  (same dir)
from hope_tpu.planning.parallel_park import build_templates


def main():
    env_cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False),
                        max_edges=96, max_obstacles=32, rs_max_tries=12)
    env = ParkingEnv(env_cfg)
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    scenes, _ = generate_bank(k1, level="Extrem", n=256)
    scenes = pad_scene_batch(scenes, 96, 32)
    maxc = env_cfg.vehicle.max_curvature

    # baseline library -> the residual scene set
    tl, ts, tp = build_templates(maxc)
    ok, _ = wiggle_validity(env, scenes, tl, ts, tp)
    ok = np.asarray(ok)
    bad = np.where(~ok.any(axis=1))[0]
    print(f"baseline templates={tl.shape[0]} coverage={ok.any(1).mean():.4f} "
          f"residual={len(bad)}")
    sub = jax.tree.map(lambda x: x[bad], scenes)

    asym = [(0.10, 0.35), (0.35, 0.10), (0.12, 0.50), (0.50, 0.12),
            (0.18, 0.30), (0.30, 0.18), (0.08, 0.25), (0.25, 0.08)]
    trials = {
        "asym-margins": dict(margins_m=tuple(asym)),
        "asym+tight-caps": dict(margins_m=tuple(asym),
                                phi_caps=(0.04, 0.08, 0.14)),
        "sym-smaller": dict(margins_m=(0.08, 0.11)),
        "deeper-aisle": dict(aisle_y_m=(1.7, 3.2, 3.6)),
        "higher-exit": dict(th_exits=(0.95, 1.1)),
        "more-backoff": dict(back_to_m=(0.4, 1.4, 2.0)),
    }
    for name, kw in trials.items():
        tl2, ts2, tp2 = build_templates(maxc, **kw)
        ok2, _ = wiggle_validity(env, sub, tl2, ts2, tp2)
        ok2 = np.asarray(ok2)
        helped = ok2.any(axis=1)
        print(f"{name:18s} T={tl2.shape[0]:4d}  rescues {helped.sum():2d}/"
              f"{len(bad)}  scenes {bad[helped].tolist()}")


if __name__ == "__main__":
    main()
