"""On-device ego-centric BEV rasterizer.

Replaces the reference's pygame full-frame render + rotate + crop + cv2 resize
pipeline (``env/car_parking_base.py:301-365``, ``env/observation_processor.py``)
with a direct per-pixel evaluation: each output pixel's world point is tested
against the obstacle polygons (crossing-number parity over the padded edge
set), the destination box, and the vehicle box.  Produces the same content
channels at the same scale/centering as the reference's processed 64x64x3
observation (background black, obstacles grey, dest green, car blue);
pixel-exact pygame parity is not a goal — the tensor feeds the policy network.

Performance (round 4, measured inside the fused 1024-env rollout on one v5e):
the production path uses GLOBAL even-odd parity — scene obstacles are disjoint
simple polygons, so a pixel is inside SOME obstacle iff its rightward ray
crosses an ODD number of live edges overall.  That turns the per-polygon
one-hot matmul into a single row-sum that XLA fuses with the crossing test
(no (P, E) intermediate materializes).  The per-polygon formulation is kept
as ``render_bev_exact`` (identical output whenever obstacles don't overlap;
on overlapping obstacles even-odd XORs the intersection out) and doubles as
the differential-test oracle.  An ego-frame separable variant was tried and
REVERTED: 54k vs 144k env-steps/s inside the fused rollout — the (rows, cols,
E) broadcast + reshape breaks XLA's fusion with the parity contraction.
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


def _crossings(points, edges, edge_mask):
    """(P, E) bf16 indicator: the +x ray from each point crosses each edge."""
    px = points[:, 0:1]
    py = points[:, 1:2]
    x1, y1, x2, y2 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    dy = y2 - y1
    denom = jnp.where(dy == 0.0, 1.0, dy)
    straddle = ((y1 > py) != (y2 > py)) & edge_mask[None, :]
    xi = x1 + (py - y1) * (x2 - x1) / denom
    return (straddle & (px < xi)).astype(jnp.bfloat16)


def _in_any_poly(points, edges, edge_mask):
    """Point-in-any-obstacle via GLOBAL even-odd parity (disjoint polygons):
    one fused compare + row-sum, no per-polygon contraction."""
    counts = jnp.sum(_crossings(points, edges, edge_mask), axis=-1)
    return jnp.mod(jnp.round(counts.astype(jnp.float32)).astype(jnp.int32),
                   2) == 1


def _in_polys_exact(points, edges, edge_mask, edge_poly, max_polys: int):
    """Per-polygon crossing parity (one-hot contraction on the MXU), then
    any-of over polygons — exact even for overlapping obstacles."""
    cross = _crossings(points, edges, edge_mask)                   # (P, E)
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


def _compose(obst, dest, car, n):
    """Draw order matches the reference (_render :301-320): obstacles, then
    dest, then the vehicle on top; background black."""
    img = jnp.zeros((n * n, 3))
    img = jnp.where(obst[:, None], _OBST, img)
    img = jnp.where(dest[:, None], _DEST, img)
    img = jnp.where(car[:, None], _CAR, img)
    return img.reshape(n, n, 3)


def render_bev(pose, vehicle_box, dest_box, edges, edge_mask, edge_poly,
               obs_cfg: ObsConfig, vcfg: VehicleConfig, max_polys: int = 64):
    """Ego-centric (H, W, 3) float BEV image for one scenario (vmap to batch).

    Production path: global even-odd parity over the edge set (see module
    docstring); identical to :func:`render_bev_exact` for non-overlapping
    obstacles, which is what both scenario generators produce.
    """
    pts = _pixel_grid(pose, obs_cfg, vcfg)
    obst = _in_any_poly(pts, edges, edge_mask)
    dest = _in_quad(pts, dest_box)
    car = _in_quad(pts, vehicle_box)
    return _compose(obst, dest, car, obs_cfg.img_size)


def render_bev_exact(pose, vehicle_box, dest_box, edges, edge_mask, edge_poly,
                     obs_cfg: ObsConfig, vcfg: VehicleConfig,
                     max_polys: int = 64):
    """Per-polygon-parity formulation (rounds 1-3 production path): exact for
    overlapping obstacles; the differential-test oracle."""
    pts = _pixel_grid(pose, obs_cfg, vcfg)
    obst = _in_polys_exact(pts, edges, edge_mask, edge_poly, max_polys)
    dest = _in_quad(pts, dest_box)
    car = _in_quad(pts, vehicle_box)
    return _compose(obst, dest, car, obs_cfg.img_size)


# backwards-compat alias for the differential tests
render_bev_oracle = render_bev_exact


def prefilter_polys(center, edges, edge_mask, edge_poly, budget: int,
                    radius: float, max_polys: int = 64):
    """Polygon-level edge prefilter for the rasterizer (opt-in fast path).

    Only polygons within ``radius`` of the image center can color any pixel,
    and crossing parity is preserved when WHOLE polygons are dropped (a closed
    polygon entirely beyond the image crosses the parity ray an even number of
    times) — so edges are regrouped by ascending polygon distance and cut at
    ``budget`` on a whole-polygon boundary.  In-radius polygons that do not
    fit the budget are dropped entirely (never truncated mid-ring), trading a
    bounded visual artifact for guaranteed parity correctness; typical scenes
    keep every in-radius polygon (procedural: ~1/3 of 96 edges near the car,
    DLP: <15% of 512).

    Args:
      center: (2,) ego/image center (vehicle box centroid).
      edges/(E,4), edge_mask/(E,), edge_poly/(E,): the scene edge set.
      budget: static output edge count K.
      radius: keep polygons with min edge distance below this (image
        half-diagonal + margin).

    Returns:
      (K, 4) edges, (K,) mask, (K,) poly ids — feed to the render functions.
    """
    from .segments import point_segment_distance

    E = edges.shape[0]
    d = point_segment_distance(center[None, :], edges)[0]          # (E,)
    d = jnp.where(edge_mask, d, jnp.inf)
    onehot = (edge_poly[:, None] == jnp.arange(max_polys)[None, :])
    onehot = onehot & edge_mask[:, None]                           # (E, K_p)
    poly_d = jnp.min(jnp.where(onehot, d[:, None], jnp.inf), axis=0)
    # A polygon that ENCLOSES the image while all its edges sit beyond
    # ``radius`` (e.g. a huge boundary ring passed as an obstacle) would flip
    # inside-parity for every pixel if dropped — the even-crossings argument
    # only covers polygons the ray exits AND enters.  Guard: any polygon whose
    # bbox contains the image center is force-kept (distance -1, sorts first).
    ex = jnp.stack([edges[:, 0], edges[:, 2]], -1)                 # (E, 2)
    ey = jnp.stack([edges[:, 1], edges[:, 3]], -1)
    big = jnp.float32(1e9)
    minx = jnp.min(jnp.where(onehot, jnp.min(ex, -1)[:, None], big), axis=0)
    maxx = jnp.max(jnp.where(onehot, jnp.max(ex, -1)[:, None], -big), axis=0)
    miny = jnp.min(jnp.where(onehot, jnp.min(ey, -1)[:, None], big), axis=0)
    maxy = jnp.max(jnp.where(onehot, jnp.max(ey, -1)[:, None], -big), axis=0)
    encloses = ((minx <= center[0]) & (center[0] <= maxx)
                & (miny <= center[1]) & (center[1] <= maxy))
    poly_d = jnp.where(encloses, -1.0, poly_d)
    poly_near = poly_d <= radius                                   # (K_p,)
    poly_n_edges = jnp.sum(onehot, axis=0)                         # (K_p,)

    # order polygons by distance; a polygon survives iff near AND its edges
    # fit the budget after all nearer polygons
    order = jnp.argsort(poly_d)                                    # (K_p,)
    counts = jnp.where(poly_near, poly_n_edges, 0)[order]
    fits_sorted = (jnp.cumsum(counts) <= budget) & poly_near[order]
    fits = jnp.zeros_like(fits_sorted).at[order].set(fits_sorted)  # (K_p,)

    edge_keep = edge_mask & fits[jnp.clip(edge_poly, 0, max_polys - 1)]
    # stable-compact kept edges to the front, then cut at the static budget
    idx = jnp.argsort(~edge_keep, stable=True)[:budget]
    return edges[idx], edge_keep[idx], edge_poly[idx]
