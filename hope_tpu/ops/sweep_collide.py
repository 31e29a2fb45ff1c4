"""Pallas TPU kernel: batched swept-trajectory vs obstacle-edge collision test.

The Reeds-Shepp endgame search validates candidate paths by intersecting the
car outline swept along the discretized path (4 box edges x N poses) against
every obstacle edge — the batched form of the reference ``is_traj_valid``
(``env/car_parking_base.py:452-534``).  At B=1024 envs x K=6 candidate words
x 288 poses this is ~0.7G segment-pair tests per env step; the XLA form is
HBM-bound on its (B, K, 4N, E) intermediates (~43 ms).  This kernel streams
(env-block, word) tiles through VMEM and keeps every intermediate on-chip:
the orientation/parameter math matches ``geometry.segments_intersect``
exactly (parallel pairs excluded, t,u in [0,1]).

Layout: grid (B/8, K); car-edge components arrive as (B, K*S) planes so each
program loads an (8, S) tile (env on sublanes, path segment on lanes), scene
edges as (B, E) planes -> (8, E) tiles.  The S x E cross product runs in
128-lane chunks as (8, 128, E) broadcasts, reduced on the fly into an (8, E)
hit accumulator; the per-word result lands in one column of the (8, K)
output block, which stays resident across the K minor grid steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENV_BLOCK = 8
_S_CHUNK = 128


def _kernel(cx1, cy1, cx2, cy2, clive, ex1, ey1, ex2, ey2, emask, out_ref,
            *, n_chunks, n_words):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qx = ex1[:][:, None, :]                               # (8, 1, E)
    qy = ey1[:][:, None, :]
    sx = ex2[:][:, None, :] - qx
    sy = ey2[:][:, None, :] - qy
    em = emask[:][:, None, :] > 0.0

    def chunk(c, hit_acc):
        sl = pl.ds(pl.multiple_of(c * _S_CHUNK, _S_CHUNK), _S_CHUNK)
        px = cx1[:, sl][:, :, None]                       # (8, sc, 1)
        py = cy1[:, sl][:, :, None]
        rx = cx2[:, sl][:, :, None] - px
        ry = cy2[:, sl][:, :, None] - py
        live = clive[:, sl][:, :, None] > 0.0

        rxs = rx * sy - ry * sx                           # (8, sc, E)
        qpx = qx - px
        qpy = qy - py
        qpxr = qpx * ry - qpy * rx
        qpxs = qpx * sy - qpy * sx
        # t = qpxs/rxs in [0,1] <=> same sign and |qpxs| <= |rxs| (rxs != 0);
        # divide-free: VPU divides are many-cycle, these are single-cycle
        arxs = jnp.abs(rxs)
        hit = ((qpxs * rxs >= 0.0) & (jnp.abs(qpxs) <= arxs)
               & (qpxr * rxs >= 0.0) & (jnp.abs(qpxr) <= arxs)
               & (rxs != 0.0) & live & em)
        return jnp.maximum(hit_acc, jnp.max(hit.astype(jnp.float32), axis=1))

    hit_acc = jax.lax.fori_loop(
        0, n_chunks, chunk, jnp.zeros(ex1.shape, jnp.float32))  # (8, E)
    res = jnp.max(hit_acc, axis=1)                        # (8,)
    col = jax.lax.broadcasted_iota(jnp.int32, (out_ref.shape[0], n_words), 1)
    out_ref[:] = jnp.where(col == k, res[:, None], out_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def swept_collide(car_edges, car_live, scene_edges, scene_mask,
                  interpret: bool = False):
    """Any-intersection test of per-word swept car outlines vs scene edges.

    Args:
      car_edges: (B, K, S, 4) car outline segments along each candidate path.
      car_live: (B, K, S) live-segment mask.
      scene_edges: (B, E, 4) obstacle segments.
      scene_mask: (B, E) live-edge mask.
      interpret: run the Pallas interpreter (CPU debugging / tests).

    Returns:
      (B, K) bool — True where the swept path hits any obstacle edge.
    """
    B, K, S, _ = car_edges.shape
    E = scene_edges.shape[1]

    pad_b = (-B) % _ENV_BLOCK
    pad_s = (-S) % _S_CHUNK
    pad_e = (-E) % 128
    if pad_b or pad_s:
        car_edges = jnp.pad(car_edges, ((0, pad_b), (0, 0), (0, pad_s), (0, 0)))
        car_live = jnp.pad(car_live, ((0, pad_b), (0, 0), (0, pad_s)))
    if pad_b or pad_e:
        scene_edges = jnp.pad(scene_edges, ((0, pad_b), (0, pad_e), (0, 0)))
        scene_mask = jnp.pad(scene_mask, ((0, pad_b), (0, pad_e)))
    Bp, Sp, Ep = B + pad_b, S + pad_s, E + pad_e

    car = car_edges.astype(jnp.float32).reshape(Bp, K * Sp, 4)
    cplanes = [car[:, :, i] for i in range(4)]
    clive = car_live.astype(jnp.float32).reshape(Bp, K * Sp)
    se = scene_edges.astype(jnp.float32)
    eplanes = [se[:, :, i] for i in range(4)]
    emask = scene_mask.astype(jnp.float32)

    car_spec = pl.BlockSpec((_ENV_BLOCK, Sp), lambda i, k: (i, k),
                            memory_space=pltpu.VMEM)
    scn_spec = pl.BlockSpec((_ENV_BLOCK, Ep), lambda i, k: (i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=Sp // _S_CHUNK, n_words=K),
        grid=(Bp // _ENV_BLOCK, K),
        in_specs=[car_spec] * 5 + [scn_spec] * 5,
        out_specs=pl.BlockSpec((_ENV_BLOCK, K), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=25 * Bp * K * Sp * Ep,
            bytes_accessed=(Bp * K * Sp * 5 + Bp * Ep * 5 * K + Bp * K) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*cplanes, clive, *eplanes, emask)
    return out[:B] > 0.0
