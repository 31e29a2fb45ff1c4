"""Print slot-frame geometry of the first collision of the best wiggle
template on selected hard Extrem scenes (CPU).  What exactly binds?

Usage: JAX_PLATFORMS=cpu python benchmarks/inspect_extrem_fail.py 11 43 58
"""
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

from diag_extrem_wiggle import wiggle_validity  # noqa: E402


def main():
    want = [int(a) for a in sys.argv[1:]] or [11, 43, 58, 104, 246]
    env_cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False),
                        max_edges=96, max_obstacles=32, rs_max_tries=12)
    env = ParkingEnv(env_cfg)
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    scenes, _ = generate_bank(k1, level="Extrem", n=256)
    scenes = pad_scene_batch(scenes, 96, 32)
    maxc = env_cfg.vehicle.max_curvature
    cfg = env.cfg

    tl, ts, tp = build_templates(maxc)
    sub = jax.tree.map(lambda x: x[np.asarray(want)], scenes)
    _, frac = wiggle_validity(env, sub, tl, ts, tp)
    frac = np.asarray(frac)

    for r, i in enumerate(want):
        j = int(np.argmax(frac[r]))
        dest = np.asarray(scenes.dest[i])
        th = dest[2]
        axv = np.array([np.cos(th), np.sin(th)])
        nxv = np.array([-np.sin(th), np.cos(th)])

        start = np.asarray(scenes.start[i])
        ysign = 1.0 if (start[:2] - dest[:2]) @ nxv >= 0 else -1.0

        t_start = tp[j]
        w_pose = np.concatenate([
            dest[:2] + t_start[0] * axv + ysign * t_start[1] * nxv,
            [th + ysign * t_start[2]]])
        w_steer = ts[j] * ysign
        poses, mask, _ = rs_mod.sample_path(
            jnp.asarray(tl[j] * maxc), jnp.asarray(w_steer),
            jnp.asarray(w_pose), maxc, cfg.rs_max_points, cfg.rs_step_size)
        poses = np.asarray(poses)
        mask = np.asarray(mask)
        out = ((poses[:, 0] < scenes.bounds[i][0])
               | (poses[:, 0] > scenes.bounds[i][1])
               | (poses[:, 1] < scenes.bounds[i][2])
               | (poses[:, 1] > scenes.bounds[i][3]))
        boxes = np.asarray(pose_to_box(jnp.asarray(poses), env.corners))
        car_edges = np.asarray(box_to_edges(jnp.asarray(boxes))).reshape(-1, 4)
        hits = np.asarray(
            segments_intersect(jnp.asarray(car_edges),
                               scenes.edges[i])) & np.asarray(
                                   scenes.edge_mask[i])[None, :]
        hits = hits.reshape(poses.shape[0], 4, -1)
        phit = (hits.any(axis=(1, 2)) | out) & mask
        k = int(np.argmax(phit))
        pose_k = poses[k]
        # slot-frame pose (mirror y by ysign so aisle is +y in print)
        rel = pose_k[:2] - dest[:2]
        u, v = rel @ axv, ysign * (rel @ nxv)
        dth = ysign * ((pose_k[2] - th + np.pi) % (2 * np.pi) - np.pi)
        eidx = np.where(hits[k].any(axis=0))[0]
        print(f"scene {i}: frac={frac[r, j]:.2f} template {j} collides at "
              f"sample {k}: slot-frame pose u={u:+.2f} v={v:+.2f} "
              f"dth={np.degrees(dth):+.1f}deg")
        for e in eidx[:4]:
            seg = np.asarray(scenes.edges[i][e]).reshape(2, 2)
            s0 = seg[0] - dest[:2]
            s1 = seg[1] - dest[:2]
            print(f"   edge {e}: ({s0 @ axv:+.2f},{ysign * (s0 @ nxv):+.2f})"
                  f" -> ({s1 @ axv:+.2f},{ysign * (s1 @ nxv):+.2f})  "
                  f"poly {int(scenes.edge_poly[i][e])}")
        if not phit.any():
            print("   (no collision?)")


if __name__ == "__main__":
    main()
