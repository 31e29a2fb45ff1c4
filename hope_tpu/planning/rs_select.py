"""Cost-ordered, collision-checked Reeds-Shepp path selection.

Replaces the reference's heapdict pop loop (``env/car_parking_base.py:431-450``)
with a fixed-iteration masked argmin cascade: each round picks the shortest
untried candidate, sweeps its discretized trajectory against the obstacle edge
set (the batched form of ``is_traj_valid`` :452-534), and stops logically when a
collision-free path is found or the reference's early-exit rule fires
(L > 1.6 x L_min after 3 tries).  Fixed shapes throughout — vmap over scenarios.
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
    max_tries: int = 12,
) -> RSPath:
    """Shortest collision-free RS path for one scenario.

    Selection semantics mirror find_rs_path: candidates tried in ascending
    length; give up on candidates with L > 1.6 x shortest once 3 have been
    tried; ``max_tries`` bounds the cascade (the reference loop is unbounded
    but in practice terminates within a few pops).
    """
    cand = rs.candidates(start, goal, maxc)
    L_m = cand.L / maxc                                # (46,) inf where invalid
    L_min = jnp.min(L_m)

    def body(carry, idx):
        tried, found, best = carry
        masked = jnp.where(tried, jnp.inf, L_m)
        pick = jnp.argmin(masked)
        pick_L = masked[pick]
        # early-exit rule (reference :441-444): after 3 tries, stop on long paths
        give_up = (pick_L > 1.6 * L_min) & (idx >= 3)
        do_try = jnp.isfinite(pick_L) & ~found & ~give_up

        poses, mask, _ = rs.sample_path(
            cand.lengths[pick], cand.steers[pick], start, maxc, n_points, step_m
        )
        collide = traj_collides(poses, mask, corners, edges, edge_mask, bounds)
        ok = do_try & ~collide

        new_best = RSPath(
            found=found | ok,
            lengths=jnp.where(ok & ~found, cand.lengths[pick] / maxc, best.lengths),
            steers=jnp.where(ok & ~found, cand.steers[pick], best.steers),
            L=jnp.where(ok & ~found, pick_L, best.L),
        )
        tried = tried.at[pick].set(tried[pick] | do_try | give_up)
        return (tried, new_best.found, new_best), None

    init = (
        jnp.zeros(rs.N_WORDS, bool),
        jnp.asarray(False),
        RSPath(jnp.asarray(False), jnp.zeros(5), jnp.zeros(5), jnp.asarray(jnp.inf)),
    )
    (_, _, best), _ = jax.lax.scan(body, init, jnp.arange(max_tries))
    return best


def build_action_queue(path: RSPath, step_ratio: float, queue_len: int = 32):
    """Convert a selected RS path into a fixed-length env action queue.

    Mirrors ``RsPlanner.set_rs_path`` (reference model/agent/parking_agent.py:12-41):
    each segment becomes steer in {-1,0,1} (normalized units) and a run of
    |len|/step_ratio chunks capped at magnitude 1, dropping residues < 1e-3.

    Returns:
      actions: (Q, 2) [steer, speed] normalized to [-1, 1].
      n_actions: () int32 live queue length.
    """
    seg_steps = path.lengths / step_ratio              # (5,) signed chunk totals
    mag = jnp.abs(seg_steps)
    sign = jnp.sign(seg_steps)
    n_full = jnp.floor(mag).astype(jnp.int32)
    rem = mag - n_full
    has_rem = rem > 1e-3
    n_chunks = n_full + has_rem.astype(jnp.int32)      # (5,)

    cum = jnp.cumsum(n_chunks)
    starts = cum - n_chunks
    total = cum[-1]

    q = jnp.arange(queue_len)
    seg_idx = jnp.clip(jnp.searchsorted(cum, q, side="right"), 0, 4)
    within = q - starts[seg_idx]
    is_rem = within == n_full[seg_idx]                 # last chunk = remainder
    speed = jnp.where(is_rem, rem[seg_idx], 1.0) * sign[seg_idx]
    steer = path.steers[seg_idx]
    live = (q < total) & path.found
    actions = jnp.stack([steer, speed], axis=-1) * live[:, None]
    return actions, jnp.where(path.found, total, 0).astype(jnp.int32)
