"""Differential tests: JAX geometry kernels vs slow scalar oracles."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.geometry import (
    boxes_collide,
    box_to_edges,
    convex_clip_area,
    edges_to_ego,
    point_segment_distance,
    polygon_area,
    pose_to_box,
    ray_hits,
    segments_intersect,
)
from hope_tpu.config import VehicleConfig

from . import oracle


def _random_edges(rng, n, scale=5.0):
    return rng.standard_normal((n, 4)) * scale


def test_segments_intersect_vs_oracle(rng):
    e1 = _random_edges(rng, 24)
    e2 = _random_edges(rng, 31)
    got = np.asarray(segments_intersect(jnp.asarray(e1), jnp.asarray(e2)))
    for i in range(len(e1)):
        for j in range(len(e2)):
            want = oracle.seg_intersect(e1[i, :2], e1[i, 2:], e2[j, :2], e2[j, 2:])
            assert got[i, j] == want, (i, j)


def test_segments_intersect_degenerate_padding():
    # zero-length padded edges must never report hits
    e1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    pad = jnp.zeros((5, 4))
    assert not np.asarray(segments_intersect(e1, pad)).any()


def test_ray_hits_vs_oracle(rng):
    angles = np.arange(120) / 120 * 2 * math.pi
    edges = _random_edges(rng, 40, scale=4.0)
    got = np.asarray(ray_hits(jnp.asarray(angles), jnp.asarray(edges), 10.0))
    for i, a in enumerate(angles):
        best = math.inf
        for e in edges:
            best = min(best, oracle.ray_segment_distance(a, e[:2], e[2:]))
        want = min(best, 10.0)
        np.testing.assert_allclose(got[i], want, rtol=1e-6, atol=1e-8)


def test_point_segment_distance_vs_oracle(rng):
    pts = rng.standard_normal((17, 2)) * 5
    edges = _random_edges(rng, 13)
    got = np.asarray(point_segment_distance(jnp.asarray(pts), jnp.asarray(edges)))
    for i, p in enumerate(pts):
        for j, e in enumerate(edges):
            want = oracle.point_seg_dist(p, e[:2], e[2:])
            np.testing.assert_allclose(got[i, j], want, rtol=1e-5, atol=1e-7)


def test_convex_clip_area_vs_oracle(rng):
    for _ in range(50):
        a = oracle.random_convex_quad(rng)
        b = oracle.random_convex_quad(rng)
        want = oracle.convex_poly_intersection_area(a, b)
        got = float(convex_clip_area(jnp.asarray(a), jnp.asarray(b)))
        # atol: float32 ULP scale for coordinates up to ~8 (area products ~64,
        # eps*64 ~ 8e-6) — sliver intersections carry that absolute error
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convex_clip_identical_and_disjoint():
    sq = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    np.testing.assert_allclose(float(convex_clip_area(sq, sq)), 1.0, rtol=1e-6)
    far = sq + 100.0
    assert float(convex_clip_area(sq, far)) == 0.0
    # half overlap
    shifted = sq + jnp.asarray([0.5, 0.0])
    np.testing.assert_allclose(float(convex_clip_area(sq, shifted)), 0.5, rtol=1e-6)


def test_pose_to_box_matches_reference_convention():
    cfg = VehicleConfig()
    corners = jnp.asarray(cfg.box_corners())
    box = np.asarray(pose_to_box(jnp.asarray([1.0, 2.0, math.pi / 2]), corners))
    # at heading pi/2, rear-right corner (-rear_hang, -w/2) maps to (w/2 + 1, 2 - rear_hang)
    np.testing.assert_allclose(box[0], [cfg.width / 2 + 1.0, 2.0 - cfg.rear_hang], atol=1e-6)
    # area preserved
    np.testing.assert_allclose(
        float(polygon_area(jnp.asarray(box))), cfg.length * cfg.width, rtol=1e-6
    )


def test_boxes_collide_containment_excluded():
    # reference LinearRing.intersects semantics: a box fully inside an obstacle
    # ring without edge crossing does NOT collide
    cfg = VehicleConfig()
    corners = jnp.asarray(cfg.box_corners())
    box = pose_to_box(jnp.asarray([0.0, 0.0, 0.0]), corners)
    box_edges = box_to_edges(box)
    giant = jnp.asarray([[-50.0, -50, 50, -50], [50, -50, 50, 50],
                         [50, 50, -50, 50], [-50, 50, -50, -50]])
    assert not bool(boxes_collide(box_edges, giant))
    # but a crossing edge does
    crossing = jnp.asarray([[0.0, -10.0, 0.0, 10.0]])
    assert bool(boxes_collide(box_edges, crossing))
    # and masking it out suppresses the hit
    assert not bool(boxes_collide(box_edges, crossing, jnp.asarray([False])))


def test_edges_to_ego_roundtrip(rng):
    pose = jnp.asarray([3.0, -2.0, 0.7])
    edges = jnp.asarray(_random_edges(rng, 9))
    ego = edges_to_ego(edges, pose)
    # transform a known point: the pose origin maps to (0,0)
    origin_edge = jnp.asarray([[3.0, -2.0, 3.0, -2.0]])
    out = edges_to_ego(origin_edge, pose)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # distances preserved (rigid transform)
    d_world = jnp.linalg.norm(edges[:, :2] - edges[:, 2:], axis=-1)
    d_ego = jnp.linalg.norm(ego[:, :2] - ego[:, 2:], axis=-1)
    np.testing.assert_allclose(np.asarray(d_world), np.asarray(d_ego), rtol=1e-6)


def test_kernels_jit_and_vmap(rng):
    e1 = jnp.asarray(_random_edges(rng, 4))
    e2 = jnp.asarray(_random_edges(rng, 8))
    batched = jax.vmap(segments_intersect, in_axes=(None, 0))(e1, jnp.stack([e2, e2 + 1]))
    assert batched.shape == (2, 4, 8)
    jit_area = jax.jit(convex_clip_area)
    sq = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    np.testing.assert_allclose(float(jit_area(sq, sq)), 1.0, rtol=1e-6)


def test_clip_green_matches_sutherland_hodgman(rng):
    from hope_tpu.geometry.clip import convex_clip_area_sh

    for _ in range(200):
        a = oracle.random_convex_quad(rng)
        b = oracle.random_convex_quad(rng)
        sh = float(convex_clip_area_sh(jnp.asarray(a), jnp.asarray(b)))
        lb = float(convex_clip_area(jnp.asarray(a), jnp.asarray(b)))
        # atol: both formulations run in float32 with coordinates up to ~8
        # (products ~64, eps*64 ~ 8e-6) — sliver areas differ at that ULP scale
        np.testing.assert_allclose(lb, sh, rtol=1e-4, atol=1e-5)


def test_clip_degenerate_shared_boundary():
    sq = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    # boxes sharing exactly one edge: zero overlap, counted once not twice
    right = sq + jnp.asarray([1.0, 0.0])
    np.testing.assert_allclose(float(convex_clip_area(sq, right)), 0.0, atol=1e-7)
    # full containment, both directions
    small = sq * 0.5 + jnp.asarray([0.25, 0.25])
    np.testing.assert_allclose(float(convex_clip_area(sq, small)), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(convex_clip_area(small, sq)), 0.25, rtol=1e-6)
    # collinear partial-overlap boundary (slot-aligned parking pose)
    slid = sq + jnp.asarray([0.5, 1.0])
    np.testing.assert_allclose(float(convex_clip_area(sq, slid)), 0.0, atol=1e-7)
