"""Kitchen-sink wiggle-parameter cross-product on the residual Extrem scenes
that survive iter_extrem_templates.py's marginal trials.  Tracks per-template
parameters so the minimal rescuing combos can be promoted into the default
build_templates sweep.

Usage:  JAX_PLATFORMS=cpu python benchmarks/iter_extrem_templates2.py
"""
import itertools
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

from diag_extrem_wiggle import wiggle_validity  # noqa: E402
from hope_tpu.planning.parallel_park import (
    N_WIGGLE_SEG, _exit_template, _exit_template_arcstraight, build_templates)


def build_custom(maxc, combos):
    """combos: iterable of (margin(-pair), cap, th_exit, aisle_y, back_to,
    fam_idx, max_pairs).  Returns arrays + the combo list per kept template."""
    R = 1.0 / maxc
    out_l, out_s, out_p, out_c = [], [], [], []
    seen = set()
    fams = (_exit_template, _exit_template_arcstraight)
    for combo in combos:
        m, cap, te, ay, bk, fi, mp = combo
        m_n = (tuple(v * maxc for v in m) if isinstance(m, tuple)
               else m * maxc)
        t = fams[fi](m_n, cap, te, ay * maxc,
                     None if bk is None else bk * maxc, max_pairs=mp)
        if t is None:
            continue
        segs, end = t
        if len(segs) > N_WIGGLE_SEG:
            continue
        entry = [(-l, s) for (l, s) in reversed(segs)]
        key = tuple(round(l, 5) for l, _ in entry)
        if key in seen:
            continue
        seen.add(key)
        L = np.zeros(N_WIGGLE_SEG, np.float32)
        S = np.zeros(N_WIGGLE_SEG, np.float32)
        for i, (l, s) in enumerate(entry):
            L[i] = l * R
            S[i] = s
        out_l.append(L)
        out_s.append(S)
        out_p.append(np.asarray([end[0] * R, end[1] * R, 0.0], np.float32))
        out_c.append(combo)
    return np.stack(out_l), np.stack(out_s), np.stack(out_p), out_c


def main():
    env_cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False),
                        max_edges=96, max_obstacles=32, rs_max_tries=12)
    env = ParkingEnv(env_cfg)
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    scenes, _ = generate_bank(k1, level="Extrem", n=256)
    scenes = pad_scene_batch(scenes, 96, 32)
    maxc = env_cfg.vehicle.max_curvature

    tl, ts, tp = build_templates(maxc)
    ok, _ = wiggle_validity(env, scenes, tl, ts, tp)
    ok = np.asarray(ok)
    bad0 = np.where(~ok.any(axis=1))[0]
    # drop the ones the marginal trials already rescue (iter_extrem_templates)
    rescued = {9, 10, 13, 14, 21, 22, 28, 80, 125, 129, 134, 136, 143, 165,
               174, 184, 197, 234, 250}
    bad = np.asarray([i for i in bad0 if i not in rescued])
    print(f"hard residual: {bad.tolist()}")
    sub = jax.tree.map(lambda x: x[bad], scenes)

    margins = [(0.06, 0.20), (0.20, 0.06), (0.10, 0.35), (0.35, 0.10),
               (0.12, 0.50), (0.50, 0.12), (0.15, 0.15), (0.10, 0.10),
               (0.25, 0.25)]
    caps = [0.03, 0.05, 0.09, 0.16]
    tes = [0.3, 0.45, 0.6, 0.8]
    ays = [1.7, 2.2, 2.8, 3.4]
    bks = [None, 0.8, 1.6]
    combos = [c + (fi, 24)
              for c in itertools.product(margins, caps, tes, ays, bks)
              for fi in (0, 1)]
    tl2, ts2, tp2, cl = build_custom(maxc, combos)
    print(f"custom templates: {tl2.shape[0]}")
    # chunk the template axis to bound memory
    hits = []
    for s in range(0, tl2.shape[0], 512):
        ok2, _ = wiggle_validity(env, sub, tl2[s:s + 512], ts2[s:s + 512],
                                 tp2[s:s + 512])
        hits.append(np.asarray(ok2))
    ok2 = np.concatenate(hits, axis=1)          # (b, T)
    print(f"rescued {ok2.any(1).sum()}/{len(bad)}: "
          f"{bad[ok2.any(1)].tolist()}")
    for r, i in enumerate(bad):
        js = np.where(ok2[r])[0]
        if len(js):
            print(f"scene {i}: {len(js)} templates; e.g.",
                  [cl[j] for j in js[:4]])


if __name__ == "__main__":
    main()
