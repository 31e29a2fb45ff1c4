"""Batched segment/ray intersection + distance kernels (pure JAX).

One kernel family serves the three hot geometry consumers of the reference:
  * swept-trajectory collision (``env/car_parking_base.py:452-534``),
  * the lidar raycaster (``env/lidar_simulator.py:74-135``),
  * the action-mask precompute (``model/action_mask.py:31-82``).

All kernels are branch-free, fixed-shape, and broadcast over arbitrary leading batch
dims — they vmap/pjit cleanly and fuse into surrounding elementwise work on the VPU.
Padded (degenerate, zero-length) edges never report intersections.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _cross2(ax, ay, bx, by):
    return ax * by - ay * bx


def segments_intersect(e1, e2, tol: float = 0.0):
    """Pairwise proper-or-touching intersection test between two edge sets.

    Args:
      e1: (..., M, 4) segments [x1, y1, x2, y2].
      e2: (..., N, 4) segments.
      tol: slack on the [0,1] parameter range (reference uses 1e-8 in the mask
        precompute and 0 in the trajectory validator).

    Returns:
      (..., M, N) bool — True where segment i of e1 intersects segment j of e2.
      Parallel (incl. collinear-overlapping) pairs report False, matching the
      det==0 exclusion in the reference (car_parking_base.py:529).
    """
    p = e1[..., :, None, 0:2]
    r = e1[..., :, None, 2:4] - p
    q = e2[..., None, :, 0:2]
    s = e2[..., None, :, 2:4] - q

    rxs = _cross2(r[..., 0], r[..., 1], s[..., 0], s[..., 1])
    qp = q - p
    qpxr = _cross2(qp[..., 0], qp[..., 1], r[..., 0], r[..., 1])
    qpxs = _cross2(qp[..., 0], qp[..., 1], s[..., 0], s[..., 1])

    parallel = rxs == 0.0
    denom = jnp.where(parallel, 1.0, rxs)
    t = qpxs / denom  # param along e1
    u = qpxr / denom  # param along e2

    lo, hi = -tol, 1.0 + tol
    hit = (t >= lo) & (t <= hi) & (u >= lo) & (u <= hi) & ~parallel
    return hit


def segment_intersection_points(e1, e2, tol: float = 1e-8):
    """Pairwise intersection points; non-intersecting pairs get +inf coords.

    Mirrors ``ActionMask._intersect`` (reference model/action_mask.py:31-82).

    Returns:
      pts: (..., M, N, 2) intersection coordinates, +inf where no intersection.
    """
    p = e1[..., :, None, 0:2]
    r = e1[..., :, None, 2:4] - p
    q = e2[..., None, :, 0:2]
    s = e2[..., None, :, 2:4] - q

    rxs = _cross2(r[..., 0], r[..., 1], s[..., 0], s[..., 1])
    qp = q - p
    qpxr = _cross2(qp[..., 0], qp[..., 1], r[..., 0], r[..., 1])
    qpxs = _cross2(qp[..., 0], qp[..., 1], s[..., 0], s[..., 1])

    parallel = rxs == 0.0
    denom = jnp.where(parallel, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom

    # tolerance expressed as a parameter slack relative to each segment's length,
    # matching the reference's coordinate-space tolerance loosely; exactness is
    # covered by the differential tests.
    len1 = jnp.maximum(jnp.linalg.norm(r, axis=-1), _EPS)
    len2 = jnp.maximum(jnp.linalg.norm(s, axis=-1), _EPS)
    t_tol = tol / len1
    u_tol = tol / len2
    hit = (
        (t >= -t_tol) & (t <= 1.0 + t_tol) & (u >= -u_tol) & (u <= 1.0 + u_tol)
        & ~parallel
    )
    pts = p + t[..., None] * r
    return jnp.where(hit[..., None], pts, jnp.inf)


def ray_hits(angles, edges, max_range: float):
    """Distance from the origin to each edge along each ray direction.

    TPU-native form of the reference lidar solve (env/lidar_simulator.py:85-134):
    instead of the line-line + quadrant-index masking, solve directly for the
    along-ray parameter t >= 0 and the edge parameter u in [0, 1].

    Args:
      angles: (R,) ray angles (ego frame).
      edges: (..., E, 4) ego-frame obstacle segments (padded entries degenerate).
      max_range: distance reported when a ray misses everything.

    Returns:
      (..., R) min distance per ray, clipped to [0, max_range].
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)

    q = edges[..., None, :, 0:2]                      # (..., 1, E, 2)
    e = edges[..., None, :, 2:4] - q                  # edge direction

    rx = c[..., :, None]                              # (..., R, 1)
    ry = s[..., :, None]

    rxs = rx * e[..., 1] - ry * e[..., 0]             # cross(ray, edge)
    parallel = rxs == 0.0
    denom = jnp.where(parallel, 1.0, rxs)

    qpx = q[..., 0]
    qpy = q[..., 1]
    t = (qpx * e[..., 1] - qpy * e[..., 0]) / denom   # along-ray distance
    u = (qpx * ry - qpy * rx) / denom                 # along-edge param

    valid = (~parallel) & (t >= 0.0) & (u >= 0.0) & (u <= 1.0)
    t = jnp.where(valid, t, max_range)
    return jnp.clip(jnp.min(t, axis=-1), 0.0, max_range)


def point_segment_distance(points, edges):
    """Pairwise point-to-segment distances.

    Replaces shapely distance queries (reference car_parking_base.py:207-211,
    map_level.py:152, parking_map_normal.py:121).

    Args:
      points: (..., P, 2)
      edges: (..., E, 4)

    Returns:
      (..., P, E) distances.
    """
    a = edges[..., None, :, 0:2]
    b = edges[..., None, :, 2:4]
    ab = b - a
    p = points[..., :, None, :]
    ap = p - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), _EPS)
    tproj = jnp.clip(jnp.sum(ap * ab, axis=-1) / denom, 0.0, 1.0)
    closest = a + tproj[..., None] * ab
    return jnp.linalg.norm(p - closest, axis=-1)


def boxes_collide(box_edges, obstacle_edges, obstacle_mask=None):
    """Edge-crossing collision between one (or a batch of) vehicle box(es) and a
    padded obstacle edge set.

    Mirrors ``_detect_collision`` semantics (reference car_parking_base.py:153-158):
    shapely LinearRing.intersects tests boundary crossings only, so full containment
    without edge crossing does not count — neither here.

    Args:
      box_edges: (..., 4, 4) the vehicle box edges.
      obstacle_edges: (..., E, 4)
      obstacle_mask: (..., E) optional bool; padded edges excluded.

    Returns:
      (...) bool.
    """
    hits = segments_intersect(box_edges, obstacle_edges)   # (..., 4, E)
    if obstacle_mask is not None:
        hits = hits & obstacle_mask[..., None, :]
    return jnp.any(hits, axis=(-1, -2))
