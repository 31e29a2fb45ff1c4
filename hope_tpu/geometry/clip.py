"""Fixed-shape convex polygon clipping (Sutherland–Hodgman) for intersection areas.

The reference computes vehicle-box ∩ dest-box areas with GEOS
(``env/car_parking_base.py:164-170`` arrival check, ``:217-226`` box-union reward).
Here the 4-gon × 4-gon clip runs as a branch-free masked-scatter pipeline over a
fixed 8-vertex buffer, so it vmaps over thousands of scenarios and fuses on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import polygon_area

_MAXV = 8  # convex quad clipped by 4 half-planes grows by <=1 vertex per plane


def _clip_halfplane(verts, n, a, b):
    """Clip convex polygon (verts[:n]) by the half-plane left of directed edge a->b.

    Returns new (verts, n). Fixed shapes: verts (_MAXV, 2), candidate buffer 2*_MAXV.
    """
    ex, ey = b[0] - a[0], b[1] - a[1]

    idx = jnp.arange(_MAXV)
    nxt_idx = jnp.where(idx + 1 >= n, 0, idx + 1)
    cur = verts
    nxt = verts[nxt_idx]

    # signed distance to the clip line (positive = inside/left)
    d_cur = ex * (cur[:, 1] - a[1]) - ey * (cur[:, 0] - a[0])
    d_nxt = ex * (nxt[:, 1] - a[1]) - ey * (nxt[:, 0] - a[0])
    in_cur = d_cur >= 0.0
    in_nxt = d_nxt >= 0.0

    denom = d_cur - d_nxt
    t = d_cur / jnp.where(denom == 0.0, 1.0, denom)
    ip = cur + t[:, None] * (nxt - cur)

    active = idx < n
    emit_cur = in_cur & active
    emit_ip = (in_cur != in_nxt) & active

    # interleave [cur_0, ip_0, cur_1, ip_1, ...] then compact by prefix sum.
    # Compaction is a one-hot contraction, not a scatter: scatters serialize
    # badly on the TPU VPU, while this (2M, M) masked matmul fuses cleanly.
    pts = jnp.stack([cur, ip], axis=1).reshape(2 * _MAXV, 2)
    flags = jnp.stack([emit_cur, emit_ip], axis=1).reshape(2 * _MAXV)
    pos = jnp.cumsum(flags) - 1
    pos = jnp.where(flags, pos, -1)  # dropped -> matches no output slot

    onehot = (pos[:, None] == jnp.arange(_MAXV)[None, :]).astype(verts.dtype)
    out = onehot.T @ pts
    return out, jnp.sum(flags)


def convex_clip_area_sh(subject, clip):
    """Area of the intersection of two convex quadrilaterals via
    Sutherland–Hodgman clipping (the vertex-buffer formulation).

    Args:
      subject: (4, 2) CCW vertices.
      clip: (4, 2) CCW vertices.

    Returns:
      scalar area (0 when disjoint).
    """
    verts = jnp.zeros((_MAXV, 2), subject.dtype).at[:4].set(subject)
    n = jnp.asarray(4)
    for i in range(4):
        verts, n = _clip_halfplane(verts, n, clip[i], clip[(i + 1) % 4])
    mask = jnp.arange(_MAXV) < n
    return jnp.where(n >= 3, polygon_area(verts, mask), 0.0)


def _green_portions(P, Q, strict: bool):
    """Green's-theorem contribution of the parts of P's edges inside Q.

    For convex Q each edge of P intersects it in ONE parameter interval
    [t0, t1], found Liang–Barsky style: every halfplane of Q is a linear
    constraint alpha + t*beta >= 0 that either raises the entry point or
    lowers the exit point.  The boundary of P∩Q is exactly {P-edge parts
    inside Q} ∪ {Q-edge parts inside P}, so summing ∮x dy over both edge sets
    yields the intersection area with no vertex buffers, no compaction, and no
    sequential clip stages — every (edge, halfplane) pair is independent VPU
    work, unlike Sutherland–Hodgman.

    ``strict`` drops portions that run exactly ALONG Q's boundary
    (beta == 0, alpha == 0): when P and Q share collinear boundary, the shared
    run must be counted once, not twice — the caller counts it for P
    (inclusive) and not for Q (strict).
    """
    p0 = P
    d = jnp.roll(P, -1, axis=0) - P                    # (4, 2) edge vectors
    q0 = Q
    e = jnp.roll(Q, -1, axis=0) - Q
    nx, ny = -e[:, 1], e[:, 0]                         # inward normals (CCW)

    alpha = ((p0[:, None, 0] - q0[None, :, 0]) * nx[None, :]
             + (p0[:, None, 1] - q0[None, :, 1]) * ny[None, :])   # (4, 4)
    beta = d[:, None, 0] * nx[None, :] + d[:, None, 1] * ny[None, :]

    para = beta == 0.0
    tc = -alpha / jnp.where(para, 1.0, beta)
    t0 = jnp.max(jnp.where(beta > 0.0, tc, 0.0), axis=1)          # entries
    t1 = jnp.min(jnp.where(beta < 0.0, tc, 1.0), axis=1)          # exits
    ok_para = jnp.where(para, alpha > 0.0 if strict else alpha >= 0.0, True)
    valid = jnp.all(ok_para, axis=1) & (t1 > t0)
    t0 = jnp.where(valid, jnp.maximum(t0, 0.0), 0.0)
    t1 = jnp.where(valid, jnp.minimum(t1, 1.0), 0.0)

    # ∮ x dy along p0 + t*d for t in [t0, t1]
    return jnp.sum(d[:, 1] * (p0[:, 0] * (t1 - t0)
                              + 0.5 * d[:, 0] * (t1 * t1 - t0 * t0)))


def convex_clip_area(subject, clip):
    """Area of the intersection of two convex quadrilaterals (CCW vertices).

    Liang–Barsky edge-interval + Green's theorem formulation (see
    :func:`_green_portions`) — branch-free, compaction-free, ~10x fewer ops
    than the Sutherland–Hodgman variant and exact for the same inputs
    (differentially tested against it and the shapely-style oracle).
    """
    # ∮x dy is translation-sensitive in float32 (x multiplies dy); centring
    # the coordinates removes the cancellation without changing the area
    c = 0.5 * (jnp.mean(subject, axis=0) + jnp.mean(clip, axis=0))
    subject = subject - c
    clip = clip - c
    return jnp.maximum(
        _green_portions(subject, clip, strict=False)
        + _green_portions(clip, subject, strict=True),
        0.0,
    )


# batched variant: (B, 4, 2) x (B, 4, 2) -> (B,)
convex_clip_area_batch = jax.vmap(convex_clip_area)
