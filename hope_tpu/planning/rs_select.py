"""Cost-ordered, collision-checked Reeds-Shepp path selection.

Replaces the reference's heapdict pop loop (``env/car_parking_base.py:431-450``)
with a fixed-iteration masked argmin cascade: each round picks the shortest
untried candidate, sweeps its discretized trajectory against the obstacle edge
set (the batched form of ``is_traj_valid`` :452-534), and stops logically when a
collision-free path is found or the reference's early-exit rule fires
(L > 1.6 x L_min after 2 tries).  Fixed shapes throughout — vmap over scenarios.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import pose_to_box, box_to_edges, segments_intersect
from . import reeds_shepp as rs


class RSPath(NamedTuple):
    """A selected RS path for one scenario (lengths in metres)."""

    found: jnp.ndarray      # () bool
    lengths: jnp.ndarray    # (5,) signed metres
    steers: jnp.ndarray     # (5,) {-1, 0, 1}
    L: jnp.ndarray          # () metres


def traj_collides(poses, pose_mask, corners, edges, edge_mask, bounds):
    """Swept-trajectory collision + outbound test.

    Args:
      poses: (N, 3) sampled path poses.
      pose_mask: (N,) live samples.
      corners: (4, 2) vehicle footprint.
      edges: (E, 4) obstacle segments.
      edge_mask: (E,) live obstacle edges.
      bounds: (4,) [xmin, xmax, ymin, ymax].

    Returns:
      () bool — True if the swept car crosses any obstacle edge or leaves bounds
      (reference is_traj_valid returns False in either case).
    """
    out = (
        (poses[:, 0] < bounds[0]) | (poses[:, 0] > bounds[1])
        | (poses[:, 1] < bounds[2]) | (poses[:, 1] > bounds[3])
    )
    outbound = jnp.any(out & pose_mask)

    boxes = pose_to_box(poses, corners)               # (N, 4, 2)
    car_edges = box_to_edges(boxes).reshape(-1, 4)    # (N*4, 4)
    live = jnp.repeat(pose_mask, 4)
    hits = segments_intersect(car_edges, edges)       # (N*4, E)
    hits = hits & live[:, None] & edge_mask[None, :]
    return outbound | jnp.any(hits)


def find_path(
    start,
    goal,
    maxc,
    corners,
    edges,
    edge_mask,
    bounds,
    n_points: int = 288,
    step_m: float = 0.1,
    max_tries: int = 6,
) -> RSPath:
    """Shortest collision-free RS path for one scenario.

    Selection semantics mirror find_rs_path: candidates considered in
    ascending length; candidates with L > 1.6 x shortest are only eligible
    among the first 2 (the reference's give-up rule :441-444 — ``idx`` is
    incremented before the ``idx > 2`` check, so only the first two pops are
    unconditional); the first (shortest) collision-free eligible candidate
    wins.

    Unlike the reference's sequential heapdict pops — and this module's
    earlier argmin cascade — the ``max_tries`` shortest words are swept and
    collision-checked IN PARALLEL (one fused kernel instead of K dependent
    rounds), then the winner falls out of a single argmax over the sorted
    validity mask.  Identical result whenever the reference terminates within
    ``max_tries`` pops, which it practically always does (it gives up after 3
    tries unless candidates stay within 1.6 x L_min).
    """
    cand = rs.candidates(start, goal, maxc)
    L_m = cand.L / maxc                                # (46,) inf where invalid

    # top-K shortest candidates, ascending
    neg, idxs = jax.lax.top_k(-L_m, max_tries)
    Ls = -neg                                          # (K,) ascending lengths
    lengths = cand.lengths[idxs]                       # (K, 5) scaled
    steers = cand.steers[idxs]                         # (K, 5)

    poses, mask, _ = jax.vmap(
        lambda l, s: rs.sample_path(l, s, start, maxc, n_points, step_m)
    )(lengths, steers)
    collide = jax.vmap(
        lambda p, m: traj_collides(p, m, corners, edges, edge_mask, bounds)
    )(poses, mask)

    rank = jnp.arange(max_tries)
    # a path longer than the discretization budget cannot be fully swept —
    # selecting it would execute an unswept (collision-unchecked) tail
    sweepable = Ls <= n_points * step_m
    eligible = sweepable & jnp.isfinite(Ls) & ((rank < 2) | (Ls <= 1.6 * Ls[0]))
    ok = eligible & ~collide
    found = jnp.any(ok)
    pick = jnp.argmax(ok)                              # first ok = shortest
    return RSPath(
        found=found,
        lengths=jnp.where(found, lengths[pick] / maxc, jnp.zeros(5)),
        steers=jnp.where(found, steers[pick], jnp.zeros(5)),
        L=jnp.where(found, Ls[pick], jnp.inf),
    )


def find_path_batch(
    starts,
    goals,
    maxc,
    corners,
    edges,
    edge_masks,
    bounds,
    n_points: int = 288,
    step_m: float = 0.1,
    max_tries: int = 6,
    use_pallas: bool = False,
) -> RSPath:
    """Batched :func:`find_path`: (B,) scenarios at once.

    Same selection semantics; the swept-trajectory collision test runs through
    the Pallas kernel (``ops.swept_collide``) when ``use_pallas`` — the whole
    (B, K, 4N, E) sweep stays in VMEM instead of round-tripping HBM.
    """
    K = max_tries
    cand = jax.vmap(lambda s, g: rs.candidates(s, g, maxc))(starts, goals)
    L_m = cand.L / maxc                                   # (B, 46)
    neg, idxs = jax.lax.top_k(-L_m, K)
    Ls = -neg                                             # (B, K) ascending
    lengths = jnp.take_along_axis(cand.lengths, idxs[:, :, None], axis=1)
    steers = jnp.take_along_axis(cand.steers, idxs[:, :, None], axis=1)

    def sample_env(ls, ss, start):
        return jax.vmap(
            lambda l, s: rs.sample_path(l, s, start, maxc, n_points, step_m)
        )(ls, ss)

    poses, mask, _ = jax.vmap(sample_env)(lengths, steers, starts)  # (B,K,N,·)

    if use_pallas:
        from ..ops.sweep_collide import swept_collide

        out = (
            (poses[..., 0] < bounds[:, None, None, 0])
            | (poses[..., 0] > bounds[:, None, None, 1])
            | (poses[..., 1] < bounds[:, None, None, 2])
            | (poses[..., 1] > bounds[:, None, None, 3])
        )
        outbound = jnp.any(out & mask, axis=-1)           # (B, K)
        boxes = pose_to_box(poses, corners)               # (B, K, N, 4, 2)
        B, _, N = poses.shape[:3]
        car_edges = box_to_edges(boxes).reshape(B, K, N * 4, 4)
        live4 = jnp.repeat(mask, 4, axis=-1)
        collide = swept_collide(car_edges, live4, edges, edge_masks) | outbound
    else:
        collide = jax.vmap(
            lambda ps, ms, e, em, b: jax.vmap(
                lambda p, m: traj_collides(p, m, corners, e, em, b)
            )(ps, ms)
        )(poses, mask, edges, edge_masks, bounds)

    rank = jnp.arange(K)[None, :]
    # over-budget paths can't be fully swept (see find_path)
    sweepable = Ls <= n_points * step_m
    eligible = sweepable & jnp.isfinite(Ls) & ((rank < 2) | (Ls <= 1.6 * Ls[:, :1]))
    ok = eligible & ~collide
    found = jnp.any(ok, axis=1)
    pick = jnp.argmax(ok, axis=1)
    take = lambda a: jnp.take_along_axis(  # noqa: E731
        a, pick[:, None, None] if a.ndim == 3 else pick[:, None], axis=1
    ).squeeze(1)
    f = found[:, None]
    return RSPath(
        found=found,
        lengths=jnp.where(f, take(lengths) / maxc, 0.0),
        steers=jnp.where(f, take(steers), 0.0),
        L=jnp.where(found, take(Ls), jnp.inf),
    )


def build_action_queue(path: RSPath, step_ratio: float, queue_len: int = 32):
    """Convert a selected RS path into a fixed-length env action queue.

    Mirrors ``RsPlanner.set_rs_path`` (reference model/agent/parking_agent.py:12-41):
    each segment becomes steer in {-1,0,1} (normalized units) and a run of
    |len|/step_ratio chunks capped at magnitude 1, dropping residues < 1e-3.

    Returns:
      actions: (Q, 2) [steer, speed] normalized to [-1, 1].
      n_actions: () int32 live queue length, clamped to ``queue_len`` — a plan
        longer than the queue executes its first Q chunks and hands control
        back, rather than replaying the final slot off-plan.
    """
    n_seg = path.lengths.shape[0]     # 5 for RS words; larger for wiggle plans
    seg_steps = path.lengths / step_ratio              # (S,) signed chunk totals
    mag = jnp.abs(seg_steps)
    sign = jnp.sign(seg_steps)
    n_full = jnp.floor(mag).astype(jnp.int32)
    rem = mag - n_full
    has_rem = rem > 1e-3
    n_chunks = n_full + has_rem.astype(jnp.int32)      # (S,)

    cum = jnp.cumsum(n_chunks)
    starts = cum - n_chunks
    total = cum[-1]

    q = jnp.arange(queue_len)
    seg_idx = jnp.clip(jnp.searchsorted(cum, q, side="right"), 0, n_seg - 1)
    within = q - starts[seg_idx]
    is_rem = within == n_full[seg_idx]                 # last chunk = remainder
    speed = jnp.where(is_rem, rem[seg_idx], 1.0) * sign[seg_idx]
    steer = path.steers[seg_idx]
    live = (q < total) & path.found
    actions = jnp.stack([steer, speed], axis=-1) * live[:, None]
    total = jnp.minimum(total, queue_len)
    return actions, jnp.where(path.found, total, 0).astype(jnp.int32)
