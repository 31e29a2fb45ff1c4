"""Difficulty classifier tests (reference env/map_level.py semantics).

Scenes are built synthetically with known expected labels; the geometric
primitives (segment-segment distance, minimum rotated rectangle) are checked
against brute-force sampling oracles.
"""
import numpy as np
import pytest

from hope_tpu.config import VehicleConfig
from hope_tpu.envs.map_level import (
    _min_rotated_rect,
    _seg_seg_dist,
    get_map_level,
)
from hope_tpu.envs.scene import LEVEL_COMPLEX, LEVEL_EXTREM, LEVEL_NORMAL, pack_polygons

VCFG = VehicleConfig()
L, W = VCFG.length, VCFG.width


def _classify(rings, start, dest):
    edges, mask, poly, n_polys = pack_polygons(rings, max_edges=256, max_polys=32)
    return get_map_level(start, dest, edges, mask, poly, n_polys, VCFG)


def _rect(cx, cy, w, h):
    return np.array([
        [cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
        [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2],
    ])


def _bay_scene(slot_gap=0.6, extra=None):
    """Dest slot at origin heading +y (car noses forward along +y): neighbour
    cars left and right, wall behind.  Rear axle sits at y=0, so the box spans
    y in [-rear_hang, wheel_base+front_hang]."""
    dest = np.array([0.0, 0.0, np.pi / 2])
    side = W + slot_gap
    neighbor_l = _rect(-side, L / 2 - VCFG.rear_hang, W, L)
    neighbor_r = _rect(+side, L / 2 - VCFG.rear_hang, W, L)
    wall = _rect(0.0, -VCFG.rear_hang - 0.4, 12.0, 0.3)
    rings = [neighbor_l, neighbor_r, wall]
    if extra is not None:
        rings.append(extra)
    return rings, dest


def _parallel_scene(slot_len=None, start=None):
    """Dest slot heading +x, cars ahead and behind along x."""
    slot_len = slot_len if slot_len is not None else L * 1.3
    dest = np.array([VCFG.rear_hang - slot_len / 2 + (slot_len - L) / 2, 0.0, 0.0])
    # dest box spans x in [dest_x - rear_hang, dest_x + wb + fh]
    box_lo = dest[0] - VCFG.rear_hang
    box_hi = dest[0] + VCFG.wheel_base + VCFG.front_hang
    gap = (slot_len - L) / 2
    car_back = _rect(box_lo - gap - L / 2, 0.0, L, W)
    car_front = _rect(box_hi + gap + L / 2, 0.0, L, W)
    curb = _rect(dest[0], -W / 2 - 0.3, 18.0, 0.3)
    return [car_back, car_front, curb], dest


# ------------------------------------------------------------- primitives


def test_seg_seg_distance_matches_sampling_oracle(rng):
    for _ in range(30):
        A = rng.uniform(-5, 5, (3, 4))
        B = rng.uniform(-5, 5, (4, 4))
        d = _seg_seg_dist(A, B)
        t = np.linspace(0, 1, 400)
        for i in range(3):
            pa = A[i, :2] + t[:, None] * (A[i, 2:] - A[i, :2])
            for j in range(4):
                pb = B[j, :2] + t[:, None] * (B[j, 2:] - B[j, :2])
                brute = np.min(np.linalg.norm(pa[:, None] - pb[None], axis=-1))
                assert d[i, j] <= brute + 1e-9
                assert d[i, j] >= brute - 2e-2  # sampling resolution


def test_min_rotated_rect_contains_points_and_is_minimal(rng):
    for _ in range(20):
        pts = rng.uniform(-4, 4, (rng.integers(3, 12), 2))
        rect = _min_rotated_rect(pts)
        # contains all points (within tolerance)
        for i in range(4):
            a, b = rect[i], rect[(i + 1) % 4]
            n = np.array([-(b - a)[1], (b - a)[0]])
            c = np.mean(rect, axis=0)
            s = np.sign((c - a) @ n)
            assert np.all(s * ((pts - a) @ n) >= -1e-6)
        # not larger than the axis-aligned bbox
        e1 = np.linalg.norm(rect[1] - rect[0])
        e2 = np.linalg.norm(rect[2] - rect[1])
        aabb = np.prod(pts.max(0) - pts.min(0))
        assert e1 * e2 <= aabb + 1e-6


# ------------------------------------------------------------ classification


def test_few_obstacles_is_normal():
    rings = [_rect(5, 5, 1, 1)]
    assert _classify(rings, [8.0, 0, 0], [0.0, 0, np.pi / 2]) == LEVEL_NORMAL


def test_easy_bay_is_normal():
    rings, dest = _bay_scene(slot_gap=1.0)
    start = np.array([5.0, 6.0, 0.0])
    assert _classify(rings, start, dest) == LEVEL_NORMAL


def test_bay_with_blocked_corridor_is_complex():
    # obstacle inside the approach corridor but beyond LENGTH/2 of the slot
    # mouth (so it is not claimed as the front neighbour)
    block = _rect(2.5, 7.0, 1.2, 1.2)
    rings, dest = _bay_scene(slot_gap=1.0, extra=block)
    start = np.array([5.0, 6.0, 0.0])
    assert _classify(rings, start, dest) == LEVEL_COMPLEX


def test_bay_face_hugging_block_is_extrem():
    # a block right off the slot's front face turns the slot into a cramped
    # pseudo-parallel case -> narrow-slot Extrem criterion fires
    block = _rect(0.0, 5.0, 1.2, 1.2)
    rings, dest = _bay_scene(slot_gap=1.0, extra=block)
    start = np.array([5.0, 6.0, 0.0])
    assert _classify(rings, start, dest) == LEVEL_EXTREM


def test_bay_far_start_is_complex():
    rings, dest = _bay_scene(slot_gap=1.0)
    start = np.array([16.5, 3.0, 0.0])  # > MAX_DRIVE_DISTANCE=15
    assert _classify(rings, start, dest) == LEVEL_COMPLEX


def test_narrow_bay_is_complex():
    # side clearance sum < 0.85 -> below Normal minimum width
    rings, dest = _bay_scene(slot_gap=0.3)
    start = np.array([5.0, 6.0, 0.0])
    assert _classify(rings, start, dest) == LEVEL_COMPLEX


def test_easy_parallel_is_normal():
    rings, dest = _parallel_scene(slot_len=L * 1.3)
    start = np.array([dest[0] + 6.0, 3.5, 0.0])
    assert _classify(rings, start, dest) == LEVEL_NORMAL


def test_tight_parallel_slot_is_extrem():
    # slot shorter than min(1.2 L, L+0.9) -> Extrem regardless of start
    rings, dest = _parallel_scene(slot_len=L + 0.5)
    start = np.array([dest[0] + 6.0, 3.5, 0.0])
    assert _classify(rings, start, dest) == LEVEL_EXTREM


def test_far_start_tight_slot_is_extrem():
    # >30 m away with slot below the Normal minimum length
    rings, dest = _parallel_scene(slot_len=L * 1.22)
    start = np.array([dest[0] + 32.0, 3.5, 0.0])
    assert _classify(rings, start, dest) == LEVEL_EXTREM


def test_open_slot_is_normal():
    # obstacles exist but none hug the slot faces
    rings = [_rect(8, 8, 1, 1), _rect(-8, 8, 1, 1)]
    assert _classify(rings, [5.0, 5.0, 0.0], [0.0, 0.0, np.pi / 2]) == LEVEL_NORMAL


def test_dlp_table_cached_and_plausible():
    d = np.load("data/dlp.npz")
    assert "levels" in d.files
    lv = d["levels"]
    assert lv.shape == d["starts"].shape[:2]
    live = np.concatenate([lv[c, : d["n_starts"][c]] for c in range(len(lv))])
    # real-world lot: mostly Normal/Complex, a whiff of Extrem
    assert set(np.unique(live)) <= {LEVEL_NORMAL, LEVEL_COMPLEX, LEVEL_EXTREM}
    assert (live == LEVEL_COMPLEX).mean() > 0.2
    assert (live == LEVEL_NORMAL).mean() > 0.2
