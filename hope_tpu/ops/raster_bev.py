"""Pallas TPU kernel for the batched ego-centric BEV rasterizer.

The full-obs rollout's dominant cost is the point-in-polygon crossing test:
(64x64 px) x (E edges) x ~7 VPU ops per env per control step (the reference
pays the equivalent render every step — ``env/car_parking_base.py:301-365``).
Round-4 profiling showed the XLA formulation reaches only ~14% of v5e VPU
peak (BASELINE.md full-obs decomposition), so this kernel owns the whole
pipeline: pixel-coordinate generation, the crossing test, even-odd parity,
the dest/vehicle quad tests, and class composition — one fused pass per env
with everything resident in VMEM.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * The crossing test runs in the EGO frame: pixel coordinates become static
    (v = forward, u = rightward, both pure functions of the pixel index), and
    the per-edge world->ego transform is an E-sized precompute in XLA.  The
    round-4 ego-frame attempt inside XLA was reverted (broadcast/reshape broke
    fusion with the parity contraction) — inside Pallas we control the layout.
  * Layout: ALL 4096 pixels live in one (32, 128) f32 tile per env; the edge
    loop is serial with the 4 per-edge params read as SMEM scalars and
    broadcast — every vector op is full-width 2D, the parity accumulator
    stays in registers, and there are no cross-lane/sublane reductions at
    all.  (A first cut with edges on sublanes and (E, 1) column broadcasts +
    a per-chunk sublane row-sum measured 3x SLOWER than the XLA fusion —
    column slices and (E, 128)-shaped reductions are exactly what Mosaic
    lowers badly.)
  * The grid is (B, E/EK): edge chunks are an outer sequential grid dimension
    accumulating into VMEM scratch, so DLP's 512-edge scenes reuse the same
    compiled body without a 3500-op unroll.
  * Parity is GLOBAL even-odd over the live edge set (semantics of
    ``geometry.raster.render_bev``): exact for disjoint obstacle polygons.
  * Ray direction is +u; crossing parity is ray-direction-invariant, so this
    matches the world-frame +x formulation up to float rounding on pixels that
    lie exactly on an edge.

Output is a (B, 64, 64) class-code map (0 background / 1 obstacle / 2 dest /
3 car); palette application and the CHW transpose stay in XLA (tiny fused
elementwise tail).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ObsConfig, VehicleConfig

_LANES = 128          # pixels per compute chunk (2 image rows at 64 px)


def _pixel_coords(n: int, res: float):
    """Static ego-frame pixel coords as (R, 128) tiles (R = n*n/128)."""
    half = (n - 1) / 2.0
    rows_per_chunk = _LANES // n
    n_chunks = (n * n) // _LANES
    ri = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, _LANES), 0)
    l2 = jax.lax.broadcasted_iota(jnp.int32, (n_chunks, _LANES), 1)
    j2 = (l2 % n).astype(jnp.float32)
    i2 = (rows_per_chunk * ri + l2 // n).astype(jnp.float32)
    return (half - i2) * res, (j2 - half) * res        # v (fwd), u (right)


def _kernel(params_ref, cnt_ref, quad_ref, out_ref, counts, poly_acc, *,
            n: int, res: float, ek: int, n_ek: int, exact: bool):
    """Grid (B, n_ek).  params (1, P, ek) SMEM edge-chunk scalars compacted so
    live edges come first (P = 4 rows global: v1/v2/slope/intercept; 5 rows
    exact: + last-edge-of-polygon flag); cnt (1, 1, 2) SMEM = (n_full,
    n_straddle); quad (1, 8, 4) SMEM half-plane coeffs; out (1, R, 128) class
    codes; counts / poly_acc (R, 128) VMEM scratch carried across edge chunks.

    The XLA prep classifies each edge (each an EXACT simplification, not an
    approximation): DROP = the edge cannot cross any pixel ray (v-interval
    misses the image, or the edge lies entirely left of it) — contributes
    zero crossings to every pixel, so dropping is exact under BOTH parity
    modes; STRADDLE-ONLY = the edge lies entirely right of the image, so
    ``u_p < ui`` holds for every straddling pixel.  At rollout poses ~80-95%
    of edges drop, so the dynamic-bound fori_loops below run ~18 of 256
    iterations — per-edge ``lax.switch`` branches were measured SLOWER than
    testing every edge (the scalar-core branch per edge defeats Mosaic's
    scheduling), while a dynamic loop bound pays one bound computation per
    chunk.

    ``exact=False``: global even-odd parity over all live edges (semantics of
    ``geometry.raster.render_bev``) — count accumulator + final mod 2, with a
    second loop handling straddle-only edges at 2 ops.
    ``exact=True``: per-polygon parity (semantics of ``render_bev_exact``,
    correct for overlapping obstacles) — edges arrive grouped by polygon with
    a last-of-poly flag; each edge folds its polygon's parity into the
    obstacle mask arithmetically (no branches):
    ``obst = max(obst, flag * odd(count)); count *= (1 - flag)``."""
    e_idx = pl.program_id(1)
    v2d, u2d = _pixel_coords(n, res)

    lo = e_idx * ek
    nf = cnt_ref[0, 0, 0]
    ns = cnt_ref[0, 0, 1]
    f_hi = jnp.clip(nf - lo, 0, ek)                    # full-test range end
    s_hi = jnp.clip(nf + ns - lo, 0, ek)               # straddle-only end

    def edge_cross(e):
        A = params_ref[0, 0, e]
        Bv = params_ref[0, 1, e]
        S = params_ref[0, 2, e]
        C = params_ref[0, 3, e]
        straddle = (A > v2d) != (Bv > v2d)
        ui = v2d * S + C
        return (straddle & (u2d < ui)).astype(jnp.float32)

    # f32 count accumulators: Mosaic cannot yield vector<i1> masks out of
    # control flow, so the loops carry exact small-integer f32 counts
    if not exact:
        def full_body(e, acc):
            return acc + edge_cross(e)

        def straddle_body(e, acc):
            A = params_ref[0, 0, e]
            Bv = params_ref[0, 1, e]
            return acc + ((A > v2d) != (Bv > v2d)).astype(jnp.float32)

        acc = jnp.zeros(v2d.shape, jnp.float32)
        acc = jax.lax.fori_loop(0, f_hi, full_body, acc)
        accf = jax.lax.fori_loop(f_hi, s_hi, straddle_body, acc)

        @pl.when(e_idx == 0)
        def _():
            counts[:] = accf

        @pl.when(e_idx > 0)
        def _():
            counts[:] = counts[:] + accf

        def final_obst():
            return (counts[:].astype(jnp.int32) % 2) == 1
    else:
        def poly_body(e, carry):
            obst, cnt_p = carry
            flag = params_ref[0, 4, e]                 # 1.0 at poly's last edge
            cnt_p = cnt_p + edge_cross(e)
            odd = cnt_p - 2.0 * jnp.floor(cnt_p * 0.5)
            obst = jnp.maximum(obst, odd * flag)
            return obst, cnt_p * (1.0 - flag)

        z = jnp.zeros(v2d.shape, jnp.float32)

        @pl.when(e_idx == 0)
        def _():
            counts[:] = z
            poly_acc[:] = z

        obst0 = counts[:]
        cnt0 = poly_acc[:]
        obst1, cnt1 = jax.lax.fori_loop(0, s_hi, poly_body, (obst0, cnt0))
        counts[:] = obst1
        poly_acc[:] = cnt1

        def final_obst():
            return counts[:] > 0.5

    @pl.when(e_idx == n_ek - 1)
    def _():
        obst = final_obst()

        def quad_in(q0):
            inside = None
            for q in range(q0, q0 + 4):
                hp = (quad_ref[0, q, 0] * v2d + quad_ref[0, q, 1] * u2d
                      + quad_ref[0, q, 2]) >= 0.0
                inside = hp if inside is None else (inside & hp)
            return inside

        dest = quad_in(0)
        car = quad_in(4)
        cls = jnp.where(car, 3.0,
                        jnp.where(dest, 2.0, jnp.where(obst, 1.0, 0.0)))
        out_ref[0, :, :] = cls


def _ego_edge_params(poses, edges, edge_mask, edge_poly, cx_off: float,
                     n: int, res: float, exact: bool):
    """Batched edge prep: ((B, P, E) compacted crossing params, (B, 2) int32
    loop bounds).

    Classifies each edge (see :func:`_kernel`) and compacts via a payload
    ``lax.sort`` so the kernel's dynamic loop bounds skip the ~80-95% dead
    tail.  Global mode sorts full-test edges first, then straddle-only, then
    dropped (P=4 param rows).  Exact mode sorts live edges GROUPED BY POLYGON
    (straddle-only edges just take the full test) and appends a
    last-edge-of-polygon flag row (P=5) for the kernel's per-poly parity
    fold.  The drop/right tests compare ego endpoints against the EXACT
    pixel-coordinate extremes the kernel generates (±half*res), so every
    class assignment is output-exact, not merely parity-safe.  All ops are
    (B, E)-shaped (a vmap over per-env (E, 4) slices measured ~1 ms at
    B=1024 from layout churn alone)."""
    B, E, _ = edges.shape
    c = jnp.cos(poses[:, 2:3])                            # (B, 1)
    s = jnp.sin(poses[:, 2:3])
    cx = poses[:, 0:1] + c * cx_off
    cy = poses[:, 1:2] + s * cx_off
    ex = edges.transpose(0, 2, 1)                         # (B, 4, E)
    dx1, dy1 = ex[:, 0] - cx, ex[:, 1] - cy
    dx2, dy2 = ex[:, 2] - cx, ex[:, 3] - cy
    v1 = c * dx1 + s * dy1
    u1 = -s * dx1 + c * dy1
    v2 = c * dx2 + s * dy2
    u2 = -s * dx2 + c * dy2
    dv = v2 - v1
    su = (u2 - u1) / jnp.where(dv == 0.0, 1.0, dv)
    uc = u1 - v1 * su
    live = edge_mask & (dv != 0.0)

    ext = jnp.float32((n - 1) / 2.0) * jnp.float32(res)   # pixel extreme
    drop = (~live
            | (jnp.minimum(v1, v2) > ext)                 # above the image
            | (jnp.maximum(v1, v2) <= -ext)               # below it
            | (jnp.maximum(u1, u2) <= -ext))              # entirely left
    right = ~drop & (jnp.minimum(u1, u2) > ext)           # entirely right

    if not exact:
        key = jnp.where(drop, 2, jnp.where(right, 1, 0)).astype(jnp.int32)
        _, v1s, v2s, sus, ucs = jax.lax.sort(
            (key, v1, v2, su, uc), num_keys=1, dimension=1, is_stable=False)
        nf = jnp.sum((key == 0).astype(jnp.int32), axis=1)
        ns = jnp.sum((key == 1).astype(jnp.int32), axis=1)
        return (jnp.stack([v1s, v2s, sus, ucs], axis=1),
                jnp.stack([nf, ns], axis=1))

    big = jnp.int32(1 << 24)
    key = jnp.where(drop, big, edge_poly.astype(jnp.int32))
    ks, v1s, v2s, sus, ucs = jax.lax.sort(
        (key, v1, v2, su, uc), num_keys=1, dimension=1, is_stable=False)
    nxt = jnp.concatenate([ks[:, 1:], jnp.full((B, 1), -1, jnp.int32)],
                          axis=1)
    flag = (ks != nxt).astype(jnp.float32)                # last edge of poly
    nf = jnp.sum((~drop).astype(jnp.int32), axis=1)
    return (jnp.stack([v1s, v2s, sus, ucs, flag], axis=1),
            jnp.stack([nf, jnp.zeros_like(nf)], axis=1))


def _quad_coeffs(poses, quads, cx_off: float):
    """Batched (B, 4, 4) half-plane coeffs [beta(v), gamma(u), alpha, 0] for
    world CCW quads (B, 4, 2), affine in ego pixel coords (cr >= 0 inside)."""
    c = jnp.cos(poses[:, 2:3])                            # (B, 1)
    s = jnp.sin(poses[:, 2:3])
    cx = poses[:, 0:1] + c * cx_off
    cy = poses[:, 1:2] + s * cx_off
    a = quads                                             # (B, 4, 2)
    b = jnp.roll(quads, -1, axis=1)
    ex, ey = b[:, :, 0] - a[:, :, 0], b[:, :, 1] - a[:, :, 1]
    beta = ex * s - ey * c
    gamma = ex * c + ey * s
    alpha = ex * (cy - a[:, :, 1]) - ey * (cx - a[:, :, 0])
    return jnp.stack([beta, gamma, alpha, jnp.zeros_like(alpha)], axis=-1)


@functools.partial(jax.jit, static_argnames=("n", "res", "exact",
                                             "interpret"))
def _raster_classes(params, cnt, quads, n: int, res: float, exact: bool,
                    interpret: bool = False):
    B, P, E = params.shape
    # Mosaic block rule: the lane-dim block must be 128-divisible or equal to
    # the array dim — so small edge sets go in whole, large ones in 128-chunks
    ek = E if E <= 128 else 128
    assert E % ek == 0, f"edge count {E} not a multiple of {ek}"
    n_ek = E // ek
    n_chunks = (n * n) // _LANES
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, res=res, ek=ek, n_ek=n_ek,
                          exact=exact),
        grid=(B, n_ek),
        in_specs=[
            pl.BlockSpec((1, P, ek), lambda b, e: (b, 0, e),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda b, e: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 4), lambda b, e: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n_chunks, _LANES), lambda b, e: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_chunks, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_chunks, _LANES), jnp.float32),
                        pltpu.VMEM((n_chunks, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=7 * B * n * n * E,
            bytes_accessed=(B * E * 5 + B * 8 * 4 + B * n * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(params, cnt.reshape(B, 1, 2), quads)
    return out.reshape(B, n, n)


# reference colors (configs.py:80-84) / 255 — keep identical to geometry.raster
_PALETTE = np.asarray(
    [[0.0, 0.0, 0.0],
     [150.0, 150.0, 150.0],
     [69.0, 139.0, 0.0],
     [30.0, 144.0, 255.0]], np.float32) / 255.0


def render_bev_batch(poses, vehicle_boxes, dest_boxes, edges, edge_mask,
                     edge_poly, obs_cfg: ObsConfig, vcfg: VehicleConfig,
                     exact: bool | None = None, interpret: bool = False):
    """Batched BEV render through the Pallas kernel.

    Args:
      poses: (B, 3); vehicle_boxes/dest_boxes: (B, 4, 2) world CCW quads;
      edges: (B, E, 4); edge_mask: (B, E); edge_poly: (B, E) int polygon ids
        (used by exact mode only).
      exact: per-polygon parity (semantics of ``render_bev_exact``, correct
        for overlapping obstacles) vs global even-odd (``render_bev``);
        defaults to ``obs_cfg.raster_parity``.
    Returns:
      (B, H, W, 3) float images.
    """
    n = obs_cfg.img_size
    assert (n * n) % _LANES == 0 and _LANES % n == 0
    if exact is None:
        exact = obs_cfg.raster_parity == "exact"
    cx_off = (vcfg.front_hang + vcfg.wheel_base - vcfg.rear_hang) / 2.0
    params, cnt = _ego_edge_params(poses, edges, edge_mask, edge_poly,
                                   cx_off, n, obs_cfg.img_res, exact)
    qd = _quad_coeffs(poses, dest_boxes, cx_off)
    qc = _quad_coeffs(poses, vehicle_boxes, cx_off)
    quads = jnp.concatenate([qd, qc], axis=1)              # (B, 8, 4)
    cls = _raster_classes(params, cnt, quads, n, obs_cfg.img_res, exact,
                          interpret=interpret)
    # palette via fused selects — an actual gather (_PALETTE[cls]) measured
    # ~200x the kernel's own cost on TPU (scatter/gather lowering)
    c = cls[..., None]
    pal = jnp.asarray(_PALETTE)
    img = jnp.where(c == 1.0, pal[1], jnp.zeros((3,), jnp.float32))
    img = jnp.where(c == 2.0, pal[2], img)
    return jnp.where(c == 3.0, pal[3], img)
