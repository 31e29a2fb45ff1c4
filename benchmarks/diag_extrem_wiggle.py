"""CPU diagnosis of Extrem wiggle-template coverage (round 5).

The r5w Extrem battery success (0.824) tracks staging coverage exactly
(`scenes_with_valid_staging` 0.820, results/result_mpc_extrem_r5w.json):
every scene with at least one valid candidate is solved, the rest time out.
This script reproduces the wiggle validity matrix for the SAME 256-scene
bank on CPU (JAX PRNG is platform-deterministic) and classifies WHY the
zero-valid scenes validate nothing: for each failing scene it finds the
template that gets furthest along its swept path before first collision and
reports where along the plan (near the slot = slot too tight for the wiggle
schedule; near the aisle start = approach lane blocked), plus the scene's
actual slot gap.

Usage:  JAX_PLATFORMS=cpu python benchmarks/diag_extrem_wiggle.py [--n 256]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import EnvConfig, ObsConfig
from hope_tpu.envs import ParkingEnv
from hope_tpu.envs.scenario_gen import generate_bank
from hope_tpu.geometry import box_to_edges, pose_to_box
from hope_tpu.geometry.segments import segments_intersect
from hope_tpu.planning import reeds_shepp as rs_mod
from hope_tpu.planning.parallel_park import build_templates
from hope_tpu.train.scene_pool import pad_scene_batch


def wiggle_validity(env, scenes, tl, ts, tp):
    """(B, T) valid mask + (B, T) first-collision arc-length fraction."""
    cfg = env.cfg
    maxc = cfg.vehicle.max_curvature
    dest = scenes.dest
    thd = dest[:, 2]
    ax = jnp.stack([jnp.cos(thd), jnp.sin(thd)], -1)
    nx = jnp.stack([-jnp.sin(thd), jnp.cos(thd)], -1)
    ysign = jnp.where(
        jnp.sum((scenes.start[:, :2] - dest[:, :2]) * nx, -1) >= 0, 1.0, -1.0)

    def tbody(_, t):
        t_len, t_steer, t_start = t
        w_pose = jnp.concatenate(
            [dest[:, :2] + t_start[0] * ax + (ysign * t_start[1])[:, None] * nx,
             (thd + ysign * t_start[2])[:, None]], axis=1)
        w_steer = t_steer[None, :] * ysign[:, None]
        w_len = jnp.broadcast_to(t_len[None, :], w_steer.shape)

        def sweep(pose, ln, st, e, em, b):
            poses, mask, _ = rs_mod.sample_path(
                ln * maxc, st, pose, maxc, cfg.rs_max_points, cfg.rs_step_size)
            out = ((poses[:, 0] < b[0]) | (poses[:, 0] > b[1])
                   | (poses[:, 1] < b[2]) | (poses[:, 1] > b[3]))
            boxes = pose_to_box(poses, env.corners)           # (N, 4, 2)
            car_edges = box_to_edges(boxes).reshape(-1, 4)    # (N*4, 4)
            hits = segments_intersect(car_edges, e) & em[None, :]
            hit = (jnp.any(hits.reshape(poses.shape[0], 4, -1), axis=(1, 2))
                   | out) & mask
            n_live = jnp.sum(mask)
            first = jnp.argmax(hit)  # 0 when no hit
            frac = jnp.where(jnp.any(hit), first / jnp.maximum(n_live, 1), 1.0)
            return ~jnp.any(hit), frac

        ok, frac = jax.vmap(sweep)(w_pose, w_len, w_steer, scenes.edges,
                                   scenes.edge_mask, scenes.bounds)
        return None, (ok, frac)

    _, (ok, frac) = jax.lax.scan(
        tbody, None, (jnp.asarray(tl), jnp.asarray(ts), jnp.asarray(tp)))
    return ok.T, frac.T  # (B, T)


def slot_gap(scenes, i, vcfg):
    """Measured free gap along the slot axis minus car length, scene i."""
    dest = np.asarray(scenes.dest[i])
    th = dest[2]
    axv = np.array([np.cos(th), np.sin(th)])
    nxv = np.array([-np.sin(th), np.cos(th)])
    e = np.asarray(scenes.edges[i]).reshape(-1, 2, 2)
    m = np.asarray(scenes.edge_mask[i])
    pts = e[m].reshape(-1, 2) - dest[:2]
    u = pts @ axv
    v = pts @ nxv
    half_w = vcfg.width / 2
    band = np.abs(v) < half_w + 0.05
    car_len = vcfg.front_hang + vcfg.wheel_base + vcfg.rear_hang
    ahead = u[band & (u > 0)]
    behind = u[band & (u < 0)]
    lo = behind.max() if behind.size else -np.inf
    hi = ahead.min() if ahead.size else np.inf
    return float(hi - lo - car_len)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    env_cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False),
                        max_edges=96, max_obstacles=32, rs_max_tries=12)
    env = ParkingEnv(env_cfg)
    key = jax.random.PRNGKey(args.seed)
    k1, _ = jax.random.split(key)
    scenes, _ = generate_bank(k1, level="Extrem", n=args.n)
    scenes = pad_scene_batch(scenes, 96, 32)

    maxc = env_cfg.vehicle.max_curvature
    tl, ts, tp = build_templates(maxc)
    ok, frac = jax.tree.map(np.asarray, wiggle_validity(env, scenes, tl, ts, tp))
    cov = ok.any(axis=1)
    print(f"templates={tl.shape[0]}  wiggle coverage: "
          f"{cov.mean():.4f} ({cov.sum()}/{args.n})")
    bad = np.where(~cov)[0]
    print("zero-valid scenes:", bad.tolist())
    for i in bad:
        j = int(np.argmax(frac[i]))
        print(f"  scene {i:3d}: slot_gap={slot_gap(scenes, i, env_cfg.vehicle):+.3f} m  "
              f"best template reaches {frac[i, j]:.2f} of its path "
              f"(entry order: aisle -> slot)")


if __name__ == "__main__":
    main()
