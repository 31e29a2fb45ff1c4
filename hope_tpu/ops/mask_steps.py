"""Pallas TPU kernel for the action-mask collision-horizon reduction.

The hottest per-step op in the rollout loop (reference ``model/action_mask.py
get_steps :166-196``): for every env, compare the 10x-upsampled 120-beam lidar
scan against the precomputed ``dist_star`` clearance table (1200 rays x 42
actions x 10 future sub-steps) and reduce to the per-action count of
collision-free sub-steps.

The first-blocked-substep + min-over-rays composition collapses to ``min over
(ray, k) of (blocked ? k : n_iter)`` (see envs/action_mask.get_steps), so the
kernel is one compare+select+min over a (1200, I*A) tile per env with the
table resident in VMEM for the whole grid.  Layout choices are driven by
Mosaic's lowering rules: the circular upsample runs outside (XLA fuses it for
free; Mosaic lacks 1-D rotates), columns are (k, a) with k major so the final
per-action min is 10 contiguous static slices (no vector reshapes), and envs
ride the lane axis in 128-wide blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENVS_PER_PROGRAM = 128  # lane-aligned env block (last block dim must be 128k)


def _kernel(up_ref, table_ref, out_ref, *, n_actions, n_iter):
    """up (RU, Bb) upsampled ext lidar; table (RU, I*A) k-major columns;
    out (Bb, A)."""
    cols = n_iter * n_actions
    j = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    kcol = (j // n_actions).astype(jnp.float32)          # k index per column
    table = table_ref[:]
    for e in range(up_ref.shape[1]):
        up = up_ref[:, e][:, None]                        # (RU, 1)
        w = jnp.where(table > up, kcol, float(n_iter))    # (RU, I*A)
        per_col = jnp.min(w, axis=0, keepdims=True)       # (1, I*A)
        acc = per_col[:, :n_actions]
        for k in range(1, n_iter):
            acc = jnp.minimum(
                acc, per_col[:, k * n_actions : (k + 1) * n_actions]
            )
        out_ref[e, :] = acc[0]


@functools.partial(jax.jit, static_argnames=("n_iter", "upsample", "interpret"))
def mask_step_lengths(obs_ext, dist_star, n_iter: int = 10, upsample: int = 10,
                      interpret: bool = False):
    """Per-action collision-free sub-step counts for a batch of envs.

    Args:
      obs_ext: (B, R) lidar distances already clipped and hull-extended
        (``clip(lidar, 0, max_range) + hull_base``).
      dist_star: (R*upsample, A, n_iter) clearance table
        (:func:`hope_tpu.envs.action_mask.build_table`).
      interpret: run the Pallas interpreter (CPU debugging / tests).

    Returns:
      (B, A) float32 step counts in [0, n_iter] — the pre-post-process
      ``step_len`` of ``envs.action_mask.get_steps``.
    """
    B, R = obs_ext.shape
    RU, A, I = dist_star.shape
    assert RU == R * upsample and I == n_iter
    # columns (k, a) with k major -> the in-kernel k-min is contiguous slices
    table = dist_star.transpose(0, 2, 1).reshape(RU, I * A).astype(jnp.float32)

    # circular linear upsample in XLA (fused gather; Mosaic has no 1-D rotate)
    obs_f = obs_ext.astype(jnp.float32)
    nxt = jnp.roll(obs_f, -1, axis=1)
    frac = (jnp.arange(upsample, dtype=jnp.float32) / upsample)[None, None, :]
    up = (obs_f[:, :, None] * (1.0 - frac) + nxt[:, :, None] * frac).reshape(B, RU)

    Bb = _ENVS_PER_PROGRAM
    pad = (-B) % Bb
    if pad:
        up = jnp.pad(up, ((0, pad), (0, 0)))
    Bp = B + pad
    up_t = up.T                                           # (RU, Bp)

    out = pl.pallas_call(
        functools.partial(_kernel, n_actions=A, n_iter=n_iter),
        grid=(Bp // Bb,),
        in_specs=[
            pl.BlockSpec((RU, Bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((RU, I * A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, A), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, A), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * RU * A * I,
            bytes_accessed=(Bp * RU + RU * I * A + Bp * A) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(up_t, table)
    return out[:B]
