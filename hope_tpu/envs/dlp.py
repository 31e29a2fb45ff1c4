"""DLP (Dragon Lake Parking) dataset runtime loader.

Replaces reference ``env/parking_map_dlp.py``: cases come from the
geometry-agnostic ``data/dlp.npz`` export (tools/export_dlp.py) instead of a
shapely pickle, and per-reset sampling (start-candidate choice + jitter, 50/50
orientation flips, bounds filter) runs as a jitted, vmappable function so whole
batches of DLP resets happen in one device call.
"""
from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig, VehicleConfig
from ..geometry import pose_to_box
from .scene import LEVEL_DLP, Scene

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data", "dlp.npz"
)


def _flip_pose(pose, corners):
    """Mirror a pose through its own box centre and turn it around
    (reference _flip_box_orientation)."""
    box = pose_to_box(pose, corners)
    c = jnp.mean(box, axis=0)
    return jnp.stack([2 * c[0] - pose[0], 2 * c[1] - pose[1], pose[2] + math.pi])


def scene_from_case_arrays(key, edges, live, poly, starts, n_starts, dest,
                           level_row, case_id, cfg: EnvConfig, corners,
                           p_raw: int = 320):
    """Sample one Scene from one case's raw arrays (reference
    ParkingMapDLP.reset :38-86): random start candidate + gaussian jitter
    (sigma 0.05 m / 0.02 rad), +-20 m bounds, polygon-level bounds filter,
    50/50 dest and start orientation flips.

    Pure function of the per-case arrays — the device-resident
    :class:`DLPDataset` indexes its banks into it, the host-streaming
    :class:`StreamingDLP` feeds it gathered batches.
    """
    ks, kj, kfd, kfs = jax.random.split(key, 4)

    si = jax.random.randint(ks, (), 0, n_starts)
    start = starts[si]
    jit3 = jax.random.normal(kj, (3,)) * jnp.asarray([0.05, 0.05, 0.02])
    start = start + jit3

    bounds = jnp.stack([
        jnp.floor(jnp.minimum(start[0], dest[0]) - 20.0),
        jnp.ceil(jnp.maximum(start[0], dest[0]) + 20.0),
        jnp.floor(jnp.minimum(start[1], dest[1]) - 20.0),
        jnp.ceil(jnp.maximum(start[1], dest[1]) + 20.0),
    ])

    flip_d = jax.random.uniform(kfd) > 0.5
    flip_s = jax.random.uniform(kfs) > 0.5
    dest = jnp.where(flip_d, _flip_pose(dest, corners), dest)
    start = jnp.where(flip_s, _flip_pose(start, corners), start)

    # polygon-level bounds filter (reference filter_obstacles :88-101):
    # drop polygons entirely outside the bounds window
    xs = jnp.stack([edges[:, 0], edges[:, 2]])
    ys = jnp.stack([edges[:, 1], edges[:, 3]])
    big = 1e9
    px_min = jax.ops.segment_min(jnp.where(live, jnp.minimum(xs[0], xs[1]), big), poly, p_raw)
    px_max = jax.ops.segment_max(jnp.where(live, jnp.maximum(xs[0], xs[1]), -big), poly, p_raw)
    py_min = jax.ops.segment_min(jnp.where(live, jnp.minimum(ys[0], ys[1]), big), poly, p_raw)
    py_max = jax.ops.segment_max(jnp.where(live, jnp.maximum(ys[0], ys[1]), -big), poly, p_raw)
    poly_keep = ~((px_max <= bounds[0]) | (px_min >= bounds[1])
                  | (py_max <= bounds[2]) | (py_min >= bounds[3]))
    live = live & poly_keep[poly]

    # compact live edges to the front and truncate to the runtime budget
    order = jnp.argsort(~live, stable=True)
    E = cfg.max_edges
    edges_c = edges[order][:E]
    live_c = live[order][:E]
    poly_c = poly[order][:E]
    # re-id polygons densely so they fit the rasterizer's max_obstacles
    uniq_first = jnp.zeros(p_raw, jnp.int32).at[poly_c].add(1) > 0
    new_id = jnp.cumsum(uniq_first) - 1
    poly_c = jnp.clip(new_id[poly_c], 0, cfg.max_obstacles - 1)

    dest_box = pose_to_box(dest, corners)
    return Scene(
        edges=edges_c.astype(jnp.float32),
        edge_mask=live_c,
        edge_poly=poly_c.astype(jnp.int32),
        n_polys=jnp.sum(uniq_first).astype(jnp.int32),
        start=start.astype(jnp.float32),
        dest=dest.astype(jnp.float32),
        dest_box=dest_box.astype(jnp.float32),
        bounds=bounds.astype(jnp.float32),
        level=level_row[si],
        case_id=jnp.asarray(case_id, jnp.int32),
    )


class DLPDataset:
    """Holds the full case bank as device arrays; 248 cases."""

    def __init__(self, path: str = _DEFAULT_PATH, env_cfg: EnvConfig | None = None,
                 vcfg: VehicleConfig = VehicleConfig(), classify: bool = True,
                 native: bool = True):
        raw = self._load(path, native)
        self.env_cfg = env_cfg or EnvConfig(max_edges=512, max_obstacles=128)
        self.vcfg = vcfg
        self.n_cases = len(raw["n_polys"])
        self.edges = jnp.asarray(raw["edges"])          # (C, E_raw, 4)
        self.edge_mask = jnp.asarray(raw["edge_mask"])  # (C, E_raw)
        self.edge_poly = jnp.asarray(raw["edge_poly"])  # (C, E_raw)
        self.n_polys = jnp.asarray(raw["n_polys"])
        self.dest = jnp.asarray(raw["dest"])            # (C, 3)
        self.starts = jnp.asarray(raw["starts"])        # (C, S, 3)
        self.n_starts = jnp.asarray(raw["n_starts"])
        self.corners = jnp.asarray(vcfg.box_corners(), jnp.float32)
        # per-(case, start-candidate) difficulty (reference classifies every
        # reset via get_map_level, parking_map_dlp.py:84; here it's a
        # precomputed table so the jitted reset is a lookup).  The exporter
        # caches it in the npz; recompute when absent.
        if "levels" in raw.files:
            levels = raw["levels"]
        elif classify:
            from .map_level import classify_cases

            levels = classify_cases(raw["starts"], raw["dest"], raw["edges"],
                                    raw["edge_mask"], raw["edge_poly"],
                                    raw["n_polys"], raw["n_starts"], vcfg)
        else:
            levels = np.full(self.starts.shape[:2], LEVEL_DLP, np.int32)
        self.level_table = jnp.asarray(levels, jnp.int32)  # (C, S)

    @staticmethod
    def _load(path: str, native: bool):
        """Load the case bank, preferring the native mmap'd HTPB1 runtime
        (hope_tpu.native.SceneBank) over the npz; the flat bank is converted
        from the npz once and cached next to it."""
        if native and path.endswith(".npz"):
            from ..native import SceneBank, convert_npz_to_bank, load_library

            if load_library() is not None:
                bank_path = path[:-4] + ".htpb"
                try:
                    if (not os.path.exists(bank_path)
                            or os.path.getmtime(bank_path) < os.path.getmtime(path)):
                        convert_npz_to_bank(path, bank_path)
                    bank = SceneBank(bank_path)
                    out = bank.gather(np.arange(bank.n_cases))
                    bank.close()
                    out["edge_mask"] = out["edge_mask"].astype(bool)

                    class _Raw(dict):
                        files = list(out.keys())

                    return _Raw(out)
                except OSError:
                    pass
        return np.load(path)

    def _flip_pose(self, pose):
        """Mirror a pose through its own box centre and turn it around
        (reference _flip_box_orientation)."""
        return _flip_pose(pose, self.corners)

    def reset_case(self, key, case_id):
        """Sample one Scene for a case id (vmap over (keys, ids) for batches).

        Mirrors ParkingMapDLP.reset (:38-86): random start candidate + gaussian
        jitter (sigma 0.05 m / 0.02 rad), +-20 m bounds, polygon-level bounds
        filter, 50/50 dest and start orientation flips.
        """
        case_id = case_id % self.n_cases
        return scene_from_case_arrays(
            key, self.edges[case_id], self.edge_mask[case_id],
            self.edge_poly[case_id], self.starts[case_id],
            self.n_starts[case_id], self.dest[case_id],
            self.level_table[case_id], case_id, self.env_cfg, self.corners)

    @partial(jax.jit, static_argnums=0)
    def batch_reset(self, keys, case_ids):
        return jax.vmap(self.reset_case)(keys, case_ids)


class StreamingDLP:
    """Host-streaming DLP reset source: per-refresh case batches are gathered
    from the mmap'd HTPB1 bank by the C++ threaded runtime
    (``native.SceneBank``) instead of keeping the whole bank device-resident,
    and the NEXT refresh's gather runs as an async prefetch that overlaps
    device compute (``scene_bank.cc:190-238``).

    This is the scalable data path for banks that outgrow HBM: device memory
    holds only the live pool slice.  The per-reset sampling semantics are
    identical to :class:`DLPDataset` (both feed
    :func:`scene_from_case_arrays`).
    """

    def __init__(self, path: str = _DEFAULT_PATH, env_cfg: EnvConfig | None = None,
                 vcfg: VehicleConfig = VehicleConfig(), nthreads: int = 4):
        from ..native import SceneBank, convert_npz_to_bank

        if path.endswith(".npz"):
            bank_path = path[:-4] + ".htpb"
            if (not os.path.exists(bank_path)
                    or os.path.getmtime(bank_path) < os.path.getmtime(path)):
                convert_npz_to_bank(path, bank_path)
            path = bank_path
        self.bank = SceneBank(path, nthreads)
        self.n_cases = self.bank.n_cases
        self.env_cfg = env_cfg or EnvConfig(max_edges=512, max_obstacles=128)
        self.corners = jnp.asarray(vcfg.box_corners(), jnp.float32)
        self._pending_ids: np.ndarray | None = None

    def _assemble(self, keys, batch: dict, ids) -> Scene:
        """Jitted transform of a host-gathered batch into reset Scenes."""
        return jax.vmap(
            lambda k, e, m, p, s, ns, d, lv, cid: scene_from_case_arrays(
                k, e, m, p, s, ns, d, lv, cid, self.env_cfg, self.corners)
        )(keys, jnp.asarray(batch["edges"]), jnp.asarray(batch["edge_mask"]),
          jnp.asarray(batch["edge_poly"]), jnp.asarray(batch["starts"]),
          jnp.asarray(batch["n_starts"]), jnp.asarray(batch["dest"]),
          jnp.asarray(batch["levels"]), jnp.asarray(ids, jnp.int32))

    def batch_reset(self, keys, ids) -> Scene:
        """Synchronous gather + assemble (cold start / non-overlapped path)."""
        ids = np.asarray(ids)
        return self._assemble(keys, self.bank.gather(ids), ids % self.n_cases)

    def prefetch(self, ids) -> None:
        """Start the background gather for the NEXT refresh's ids."""
        ids = np.asarray(ids)
        self.bank.prefetch(ids)
        self._pending_ids = ids % self.n_cases

    def take_scenes(self, keys) -> tuple[Scene, np.ndarray]:
        """Finish the in-flight prefetch; returns (scenes, case_ids used)."""
        if self._pending_ids is None:
            raise RuntimeError("no prefetch in flight")
        batch = self.bank.take()
        ids = self._pending_ids
        self._pending_ids = None
        return self._assemble(keys, batch, ids), ids
