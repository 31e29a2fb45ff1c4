"""Export the reference DLP dataset pickle to a geometry-agnostic npz.

The reference ``data/dlp.data`` (loaded by env/parking_map_dlp.py:31-36) pickles
shapely LinearRings; shapely is unavailable here, so a stub module captures the
WKB byte payloads and a 30-line WKB LineString parser recovers the coordinate
rings.  Output: padded per-case arrays ready to become ``Scene`` pytrees.

Usage: python tools/export_dlp.py [--src /root/reference/data/dlp.data]
                                  [--out data/dlp.npz]
"""
from __future__ import annotations

import argparse
import pickle
import struct
import sys
import types

import numpy as np


def _install_shapely_stub():
    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")
    polygon = types.ModuleType("shapely.geometry.polygon")

    class LinearRing:  # captures the pickled WKB state
        def __init__(self, *args):
            self.wkb = None

        def __setstate__(self, state):
            self.wkb = state

    polygon.LinearRing = LinearRing
    geometry.polygon = polygon
    shapely.geometry = geometry
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = geometry
    sys.modules["shapely.geometry.polygon"] = polygon


def parse_wkb_linestring(buf: bytes) -> np.ndarray:
    """Minimal WKB parser for 2-D LineString payloads."""
    bo = "<" if buf[0] == 1 else ">"
    geom_type, n = struct.unpack_from(bo + "II", buf, 1)
    assert geom_type == 2, f"expected LineString, got {geom_type}"
    coords = struct.unpack_from(bo + f"{2 * n}d", buf, 9)
    return np.asarray(coords, np.float64).reshape(n, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/data/dlp.data")
    ap.add_argument("--out", default="data/dlp.npz")
    ap.add_argument("--max-edges", type=int, default=1024)
    ap.add_argument("--max-polys", type=int, default=256)
    ap.add_argument("--max-starts", type=int, default=128)
    args = ap.parse_args()

    _install_shapely_stub()
    with open(args.src, "rb") as f:
        data = pickle.load(f)

    n_cases = len(data)
    E, P, S = args.max_edges, args.max_polys, args.max_starts
    edges = np.zeros((n_cases, E, 4), np.float32)
    edge_mask = np.zeros((n_cases, E), bool)
    edge_poly = np.zeros((n_cases, E), np.int32)
    n_polys = np.zeros(n_cases, np.int32)
    dests = np.zeros((n_cases, 3), np.float32)
    starts = np.zeros((n_cases, S, 3), np.float32)
    n_starts = np.zeros(n_cases, np.int32)

    stats_edges, stats_starts = [], []
    for ci, case in enumerate(data):
        start, dest, obstacles = case[:3]
        if not isinstance(start, list):          # single-start legacy format
            start = [tuple(start)]
        ns = min(len(start), S)
        for si in range(ns):
            starts[ci, si] = start[si][:3]
        n_starts[ci] = ns
        dests[ci] = dest[:3]

        k = 0
        pid = 0
        for ob in obstacles[:P]:
            ring = parse_wkb_linestring(ob.wkb)
            if len(ring) > 1 and np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]
            for i in range(len(ring)):
                if k >= E:
                    break
                a, b = ring[i], ring[(i + 1) % len(ring)]
                edges[ci, k] = [a[0], a[1], b[0], b[1]]
                edge_mask[ci, k] = True
                edge_poly[ci, k] = pid
                k += 1
            pid += 1
        n_polys[ci] = pid
        stats_edges.append(k)
        stats_starts.append(ns)

    # difficulty per (case, start candidate) — reference classifies every
    # reset (parking_map_dlp.py:84); cached here so loading is a table lookup
    from hope_tpu.envs.map_level import classify_cases

    levels = classify_cases(starts, dests, edges, edge_mask, edge_poly,
                            n_polys, n_starts)

    np.savez_compressed(
        args.out,
        edges=edges, edge_mask=edge_mask, edge_poly=edge_poly, n_polys=n_polys,
        dest=dests, starts=starts, n_starts=n_starts, levels=levels,
    )
    print(f"exported {n_cases} cases -> {args.out}")
    print(f"edges/case: max={max(stats_edges)} mean={np.mean(stats_edges):.1f}")
    print(f"start candidates/case: max={max(stats_starts)} mean={np.mean(stats_starts):.1f}")


if __name__ == "__main__":
    main()
