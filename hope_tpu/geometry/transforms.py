"""Pose / rigid-transform helpers (pure JAX, shape-polymorphic over leading dims).

TPU-native replacement for the reference's shapely ``affine_transform`` usage
(``env/vehicle.py:32-36``, ``env/lidar_simulator.py:55-72``): rigid transforms are
expressed as fused elementwise math so XLA folds them into surrounding kernels.
"""
from __future__ import annotations

import jax.numpy as jnp


def pose_to_box(pose, corners):
    """Vehicle footprint corners at a pose.

    Args:
      pose: (..., 3) [x, y, theta] — rear-axle position + heading.
      corners: (4, 2) footprint corners in the rear-axle frame.

    Returns:
      (..., 4, 2) world-frame corners. Matches ``State.create_box``
      (reference env/vehicle.py:32-36).
    """
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    cx = corners[:, 0]
    cy = corners[:, 1]
    wx = c[..., None] * cx - s[..., None] * cy + x[..., None]
    wy = s[..., None] * cx + c[..., None] * cy + y[..., None]
    return jnp.stack([wx, wy], axis=-1)


def box_to_edges(box):
    """Closed-ring edges of a polygon given its vertices.

    Args:
      box: (..., V, 2) vertices (ring closure implied).

    Returns:
      (..., V, 4) edges as [x1, y1, x2, y2].
    """
    nxt = jnp.roll(box, shift=-1, axis=-2)
    return jnp.concatenate([box, nxt], axis=-1)


def world_to_ego(points, pose):
    """Transform world points into the ego frame of ``pose``.

    Matches the affine map in the reference lidar
    (``env/lidar_simulator.py:59-64``): rotate by -theta about the ego origin.

    Args:
      points: (..., 2)
      pose: (3,) or broadcastable (..., 3)

    Returns:
      (..., 2) ego-frame points.
    """
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    dx = points[..., 0] - x
    dy = points[..., 1] - y
    ex = c * dx + s * dy
    ey = -s * dx + c * dy
    return jnp.stack([ex, ey], axis=-1)


def edges_to_ego(edges, pose):
    """Transform (..., E, 4) [x1,y1,x2,y2] edges into the ego frame of ``pose`` (3,)."""
    p1 = world_to_ego(edges[..., 0:2], pose[..., None, :])
    p2 = world_to_ego(edges[..., 2:4], pose[..., None, :])
    return jnp.concatenate([p1, p2], axis=-1)


def polygon_area(verts, mask=None):
    """Shoelace area of (..., V, 2) polygons; ``mask`` (..., V) selects live vertices.

    Masked vertices must be padded with a repeat of a live vertex (zero-length edges
    contribute nothing to the shoelace sum).
    """
    x = verts[..., 0]
    y = verts[..., 1]
    if mask is not None:
        # collapse dead vertices onto the first live one so they add zero area
        x = jnp.where(mask, x, x[..., :1])
        y = jnp.where(mask, y, y[..., :1])
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * yn - xn * y, axis=-1))
