"""On-device ego-centric BEV rasterizer.

Replaces the reference's pygame full-frame render + rotate + crop + cv2 resize
pipeline (``env/car_parking_base.py:301-365``, ``env/observation_processor.py``)
with a direct per-pixel evaluation: each output pixel is tested against the
obstacle polygons (crossing-number parity via an MXU matmul over the padded
edge set), the destination box, and the vehicle box.  Produces the same
content channels at the same scale/centering as the reference's processed
64x64x3 observation (background black, obstacles grey, dest green, car blue);
pixel-exact pygame parity is not a goal — the tensor feeds the policy network.

Performance shape (round 4): the scene geometry is transformed into the EGO
frame once per scenario (E edges, trivial), where the pixel grid is a regular
axis-aligned lattice — the crossing ray runs along +x (ego right, the column
axis), so the straddle test and the edge/ray intersection abscissa depend only
on the pixel ROW: (N, E) intermediates instead of (N*N, E), with the single
per-pixel comparison fused into the parity matmul.  Crossing parity is
ray-direction independent, so the result matches the world-frame formulation
(kept below as the test oracle) except on degenerate boundary pixels.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import ObsConfig, VehicleConfig

# reference colors (configs.py:80-84) / 255 — numpy on purpose: creating
# jnp arrays at import time initializes the XLA backend, which would break
# jax.distributed.initialize() in multi-host CLIs (it must run first)
import numpy as np

_OBST = np.asarray([150.0, 150.0, 150.0], np.float32) / 255.0
_DEST = np.asarray([69.0, 139.0, 0.0], np.float32) / 255.0
_CAR = np.asarray([30.0, 144.0, 255.0], np.float32) / 255.0


def _ego_center(pose, vcfg: VehicleConfig):
    """Image center = vehicle box centroid (reference crop centering)."""
    cx_off = (vcfg.front_hang + vcfg.wheel_base - vcfg.rear_hang) / 2.0
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    return pose[0] + c * cx_off, pose[1] + s * cx_off, c, s


def _to_ego(xy_x, xy_y, cx, cy, c, s):
    """World -> ego (right, fwd): the inverse of the pixel-grid rotation
    [wx - cx, wy - cy] = R(theta) @ [fwd, right]."""
    dx = xy_x - cx
    dy = xy_y - cy
    fwd = c * dx + s * dy
    right = -s * dx + c * dy
    return right, fwd


def render_bev(pose, vehicle_box, dest_box, edges, edge_mask, edge_poly,
               obs_cfg: ObsConfig, vcfg: VehicleConfig, max_polys: int = 64):
    """Ego-centric (H, W, 3) float BEV image for one scenario (vmap to batch).

    Draw order matches the reference (_render :301-320): obstacles, then dest,
    then the vehicle on top; background black (processed obs, observation_
    processor.py:11-23).
    """
    n = obs_cfg.img_size
    res = obs_cfg.img_res
    half = (n - 1) / 2.0
    i = jnp.arange(n)
    u = ((i - half) * res).astype(jnp.float32)      # column -> ego right
    v = ((half - i) * res).astype(jnp.float32)      # row    -> ego fwd

    cx, cy, c, s = _ego_center(pose, vcfg)

    # obstacle edges in ego coords: straddle/abscissa depend only on the row
    ex1, ey1 = _to_ego(edges[:, 0], edges[:, 1], cx, cy, c, s)   # (E,)
    ex2, ey2 = _to_ego(edges[:, 2], edges[:, 3], cx, cy, c, s)
    dy = ey2 - ey1
    denom = jnp.where(dy == 0.0, 1.0, dy)
    straddle = ((ey1[None, :] > v[:, None]) != (ey2[None, :] > v[:, None]))
    straddle = straddle & edge_mask[None, :]                     # (N, E)
    xi = ex1[None, :] + (v[:, None] - ey1[None, :]) * (ex2 - ex1)[None, :] / denom[None, :]

    # per-pixel crossing: (N rows, N cols, E) comparison fused into the parity
    # matmul; counts (N, N, K) on the MXU via the edge->polygon one-hot
    cross = (straddle[:, None, :] & (u[None, :, None] < xi[:, None, :]))
    cross = cross.astype(jnp.bfloat16)
    onehot = (edge_poly[:, None] == jnp.arange(max_polys)[None, :])
    onehot = (onehot & edge_mask[:, None]).astype(jnp.bfloat16)  # (E, K)
    counts = jnp.dot(cross.reshape(n * n, -1), onehot,
                     preferred_element_type=jnp.float32)
    inside_k = jnp.mod(jnp.round(counts).astype(jnp.int32), 2) == 1
    obst = jnp.any(inside_k, axis=-1)                            # (N*N,)

    # dest/vehicle quads: half-plane tests on the separable ego lattice
    def in_quad_ego(quad):
        qx, qy = _to_ego(quad[:, 0], quad[:, 1], cx, cy, c, s)   # (4,)
        inside = jnp.ones((n, n), bool)
        for k in range(4):
            ax, ay = qx[k], qy[k]
            bx, by = qx[(k + 1) % 4], qy[(k + 1) % 4]
            # cross((b-a), (p-a)) with p = (right=u_c, fwd=v_r); the
            # (right, fwd) frame is a REFLECTION of world xy (det -1), so
            # world-CCW quads are CW here — the inside half-plane flips sign
            cr = (bx - ax) * (v[:, None] - ay) - (by - ay) * (u[None, :] - ax)
            inside = inside & (cr <= 0.0)
        return inside.reshape(-1)

    dest = in_quad_ego(dest_box)
    car = in_quad_ego(vehicle_box)

    img = jnp.zeros((n * n, 3))
    img = jnp.where(obst[:, None], _OBST, img)
    img = jnp.where(dest[:, None], _DEST, img)
    img = jnp.where(car[:, None], _CAR, img)
    return img.reshape(n, n, 3)


# ----------------------------------------------------------------- oracle ----
# The original world-frame formulation, kept as the differential-test oracle
# (tests/test_raster.py): same parity semantics, world-frame +x ray.

def _pixel_grid(pose, obs_cfg: ObsConfig, vcfg: VehicleConfig):
    """World coordinates of each output pixel: image centered on the vehicle
    box centroid, rotated so the car points up (+row 0)."""
    n = obs_cfg.img_size
    res = obs_cfg.img_res
    half = (n - 1) / 2.0
    i = jnp.arange(n)
    u = (i - half) * res          # rightward in ego frame (columns)
    v = (half - i) * res          # forward in ego frame (rows)
    fwd, right = jnp.meshgrid(v, u, indexing="ij")      # (n, n)

    cx_off = (vcfg.front_hang + vcfg.wheel_base - vcfg.rear_hang) / 2.0
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    cx = pose[0] + c * cx_off
    cy = pose[1] + s * cx_off
    wx = cx + c * fwd - s * right
    wy = cy + s * fwd + c * right
    return jnp.stack([wx, wy], axis=-1).reshape(-1, 2)  # (n*n, 2)


def _in_polys(points, edges, edge_mask, edge_poly, max_polys: int):
    """Point-in-any-polygon via crossing-number parity (world-frame ray)."""
    px = points[:, 0:1]
    py = points[:, 1:2]
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    dy = y2 - y1
    denom = jnp.where(dy == 0.0, 1.0, dy)
    straddle = ((y1 > py) != (y2 > py)) & edge_mask[None, :]
    xi = x1 + (py - y1) * (x2 - x1) / denom
    cross = (straddle & (px < xi)).astype(jnp.bfloat16)           # (P, E)

    onehot = (edge_poly[:, None] == jnp.arange(max_polys)[None, :])
    onehot = (onehot & edge_mask[:, None]).astype(jnp.bfloat16)    # (E, K)
    counts = jnp.dot(cross, onehot, preferred_element_type=jnp.float32)
    inside_k = jnp.mod(jnp.round(counts).astype(jnp.int32), 2) == 1
    return jnp.any(inside_k, axis=-1)                              # (P,)


def _in_quad(points, quad):
    """Point in convex CCW quad via 4 half-plane tests."""
    inside = jnp.ones(points.shape[0], bool)
    for i in range(4):
        a = quad[i]
        b = quad[(i + 1) % 4]
        cr = (b[0] - a[0]) * (points[:, 1] - a[1]) - (b[1] - a[1]) * (points[:, 0] - a[0])
        inside = inside & (cr >= 0.0)
    return inside


def render_bev_oracle(pose, vehicle_box, dest_box, edges, edge_mask, edge_poly,
                      obs_cfg: ObsConfig, vcfg: VehicleConfig,
                      max_polys: int = 64):
    """World-frame reference implementation (rounds 1-3 production path)."""
    pts = _pixel_grid(pose, obs_cfg, vcfg)
    obst = _in_polys(pts, edges, edge_mask, edge_poly, max_polys)
    dest = _in_quad(pts, dest_box)
    car = _in_quad(pts, vehicle_box)

    n = obs_cfg.img_size
    img = jnp.zeros((n * n, 3))
    img = jnp.where(obst[:, None], _OBST, img)
    img = jnp.where(dest[:, None], _DEST, img)
    img = jnp.where(car[:, None], _CAR, img)
    return img.reshape(n, n, 3)
