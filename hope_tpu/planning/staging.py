"""Staging-pose precomputation for the pure-MPC approach phase.

The round-3 failure diagnosis (BASELINE.md, results/result_mpc_dlp*.json): all
pure-MPC DLP failures were RS-never-validated time-outs — receding-horizon iLQR
aimed straight at the slot pose cannot steer the hardest DLP cases into poses
from which the Reeds-Shepp endgame validates.  The fix mirrors how a human (and
the trained RL policy) parks: drive to a *staging pose* in the aisle near the
slot from which the final RS maneuver is known to work, then let the RS endgame
take over.

For each scenario this module enumerates a fixed set of candidate staging
poses around the destination (offsets along the slot axis for bay approaches,
lateral offsets for parallel slots, at the four axis-aligned headings), and
collision-checks the *RS completion* staging -> dest with the same swept-car
test the env's endgame search uses (``rs_select.find_path_batch``, the batched
form of reference ``env/car_parking_base.py:413-450``).  The swept test starts
at the staging pose itself, so candidate validity covers both "the car fits
there" and "RS finishes from there".

The MPC runner then targets, each replan, the valid staging pose minimizing
(distance-to-go + RS completion length) — falling back to the slot pose when
no staging candidate validates (open scenes, where direct approach works).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rs_select import find_path_batch

# dense polar grid around the slot: radii x position-angles x headings, all
# relative to the slot heading.  The RS-validatable pose manifold is thin (the
# trained RL policy finds it by fiddling — eval shows latching from scattered
# poses), so a sparse hand-picked set misses it on ~half the scenes; a dense
# grid recovers it at linear precompute cost (one batched RS search per
# candidate, scanned).  Round 5 kept the round-4 grid after two measured
# negatives: densifying (radii from 1 m, 30 deg headings) did NOT lift
# Extrem coverage (82% of those scenes admit no single-RS completion from
# ANY pose — the wiggle templates below are the actual fix) and the changed
# candidate ordering cost 2/256 DLP cases (1.000 -> 0.992,
# log/mpc_r5w_dlp_p30 vs log/mpc_r5_portfolio).
_RADII = (2.0, 3.0, 4.5, 6.0, 8.0)
_N_ANGLES = 8
_N_HEADINGS = 8


def staging_candidates(dest,
                       radii=_RADII,
                       n_angles: int = _N_ANGLES,
                       n_headings: int = _N_HEADINGS) -> jnp.ndarray:
    """Dense candidate staging poses for one scenario.

    Args:
      dest: (3,) slot pose [x, y, heading].

    Returns:
      (S, 3) candidate poses, S = len(radii) * n_angles * n_headings.
    """
    thd = dest[2]
    r = jnp.asarray(radii)                                    # (R,)
    phi = thd + jnp.arange(n_angles) * (2 * jnp.pi / n_angles)  # (A,)
    hd = thd + jnp.arange(n_headings) * (2 * jnp.pi / n_headings)  # (H,)
    x = dest[0] + r[:, None] * jnp.cos(phi)[None, :]          # (R, A)
    y = dest[1] + r[:, None] * jnp.sin(phi)[None, :]
    xy = jnp.stack([x, y], axis=-1).reshape(-1, 2)            # (R*A, 2)
    poses = jnp.concatenate(
        [jnp.repeat(xy, n_headings, axis=0),
         jnp.tile(hd, xy.shape[0])[:, None]], axis=1)         # (R*A*H, 3)
    return poses


N_STAGING = len(_RADII) * _N_ANGLES * _N_HEADINGS


class StagingSet(NamedTuple):
    poses: jnp.ndarray    # (B, S, 3)
    L: jnp.ndarray        # (B, S) completion length, +inf where invalid
    lengths: jnp.ndarray  # (B, S, K) completion segment lengths (signed, m)
    steers: jnp.ndarray   # (B, S, K) completion segment steers {-1, 0, 1}


# slow-maneuver penalty added to wiggle-template L: large enough that a
# wiggle candidate ranks below EVERY valid single-RS completion (soft
# fallback — wiggles engage only once the polar candidates are exhausted).
# A +4 penalty let wiggle plans preempt workable RS plans on 2/256 DLP
# scenes (1.000 -> 0.992, log/mpc_r5w_dlp); valid polar completions are
# always < 20 m, so +30 strictly orders the families while keeping wiggles
# inside the replan candidate window (invalid candidates stay at +inf).
_WIGGLE_PENALTY = 30.0


def compute_staging(env, scenes, max_tries: int = 6,
                    parallel_templates: bool = True) -> StagingSet:
    """Validate every candidate's completion against the scene obstacles.

    Two candidate families share one StagingSet:
      * the polar grid with single-RS-word completions — one batched RS search
        per candidate slot (scanned, so memory stays at the per-candidate
        level); valid iff a collision-free RS path staging -> dest exists
        within ``max_tries`` shortest words;
      * multi-cusp parallel-parking wiggle templates
        (``parallel_park.build_templates``) — scene-independent arc plans in
        the slot frame, each placed at the slot (mirrored to the scene's
        aisle side) and swept against the actual obstacles.  These are what
        close tight parallel slots, where the RS validity manifold collapses
        to the parked pose itself (Extrem diagnosis, log/mpc_r5_extrem).

    The winning completion's segment decomposition is kept (RS words padded
    to the template segment count) so the MPC runner can execute it verbatim
    after reaching the staging pose (two-segment latching).
    """
    cfg = env.cfg
    maxc = cfg.vehicle.max_curvature
    cands = jax.vmap(staging_candidates)(scenes.dest)    # (B, S, 3)

    def body(_, s_pose):                                 # s_pose: (B, 3)
        rs = find_path_batch(
            s_pose, scenes.dest, maxc, env.corners,
            scenes.edges, scenes.edge_mask, scenes.bounds,
            n_points=cfg.rs_max_points, step_m=cfg.rs_step_size,
            max_tries=max_tries, use_pallas=env._pallas_mask,
        )
        return None, (rs.found, rs.L, rs.lengths, rs.steers)

    _, (valid, L, lengths, steers) = jax.lax.scan(
        body, None, jnp.transpose(cands, (1, 0, 2)))     # leading dim S
    valid = valid.T                                      # (B, S)
    L = jnp.where(valid, L.T, jnp.inf)
    lengths = jnp.transpose(lengths, (1, 0, 2))          # (B, S, 5)
    steers = jnp.transpose(steers, (1, 0, 2))

    if not parallel_templates:
        return StagingSet(poses=cands, L=L, lengths=lengths, steers=steers)

    from .parallel_park import N_WIGGLE_SEG, build_templates
    from .rs_select import traj_collides
    from . import reeds_shepp as rs_mod

    v = cfg.vehicle
    tl, ts, tp = build_templates(
        maxc, dims=(v.rear_hang, v.front_hang + v.wheel_base, v.width / 2))
    T = tl.shape[0]
    n_pts = cfg.rs_max_points

    dest = scenes.dest
    thd = dest[:, 2]
    ax = jnp.stack([jnp.cos(thd), jnp.sin(thd)], -1)     # (B, 2) slot axis
    nx = jnp.stack([-jnp.sin(thd), jnp.cos(thd)], -1)    # (B, 2) slot normal
    # aisle side: the episode start pose is in the aisle by construction
    ysign = jnp.where(
        jnp.sum((scenes.start[:, :2] - dest[:, :2]) * nx, -1) >= 0, 1.0, -1.0)

    def tbody(_, t):
        t_len, t_steer, t_start = t                      # (K,), (K,), (3,)
        # mirror to the aisle side: (x, y, th) -> (x, -y, -th), steers flip
        w_pose = jnp.concatenate(
            [dest[:, :2] + t_start[0] * ax + (ysign * t_start[1])[:, None] * nx,
             (thd + ysign * t_start[2])[:, None]], axis=1)   # (B, 3)
        w_steer = t_steer[None, :] * ysign[:, None]          # (B, K)
        w_len = jnp.broadcast_to(t_len[None, :], w_steer.shape)

        def sweep(pose, ln, st, e, em, b):
            poses, mask, _ = rs_mod.sample_path(
                ln * maxc, st, pose, maxc, n_pts, cfg.rs_step_size)
            return traj_collides(poses, mask, env.corners, e, em, b)

        collide = jax.vmap(sweep)(w_pose, w_len, w_steer, scenes.edges,
                                  scenes.edge_mask, scenes.bounds)
        return None, (w_pose, ~collide, w_len, w_steer)

    _, (tw_pose, tw_valid, tw_len, tw_steer) = jax.lax.scan(
        tbody, None,
        (jnp.asarray(tl), jnp.asarray(ts), jnp.asarray(tp)))  # leading dim T
    tw_pose = jnp.transpose(tw_pose, (1, 0, 2))          # (B, T, 3)
    tw_valid = tw_valid.T                                # (B, T)
    tw_len = jnp.transpose(tw_len, (1, 0, 2))            # (B, T, K)
    tw_steer = jnp.transpose(tw_steer, (1, 0, 2))
    tw_L = jnp.where(tw_valid,
                     jnp.sum(jnp.abs(tw_len), -1) + _WIGGLE_PENALTY, jnp.inf)

    K = N_WIGGLE_SEG
    pad = ((0, 0), (0, 0), (0, K - lengths.shape[-1]))
    return StagingSet(
        poses=jnp.concatenate([cands, tw_pose], axis=1),
        L=jnp.concatenate([L, tw_L], axis=1),
        lengths=jnp.concatenate([jnp.pad(lengths, pad), tw_len], axis=1),
        steers=jnp.concatenate([jnp.pad(steers, pad), tw_steer], axis=1),
    )


def concat_queues(q1, n1, q2, n2, queue_len: int):
    """Concatenate two fixed-shape action queues: [q1[:n1], q2[:n2]], clamped
    to ``queue_len`` (truncation ends execution mid-path and hands control
    back — safe, the executed prefix is collision-checked)."""
    idx = jnp.arange(queue_len)
    take2 = jnp.clip(idx - n1, 0, queue_len - 1)
    q = jnp.where((idx < n1)[:, None], q1, q2[take2])
    n = jnp.minimum(n1 + n2, queue_len)
    return q * (idx < n)[:, None], n


def waypoint_latch(env, staging: StagingSet, pose, scenes, hybrid,
                   active, step_ratio: float, k_best: int = 4,
                   offset: int = 0):
    """Two-segment RS latch: try RS(pose -> staging_s) for the ``k_best``
    cheapest valid staging candidates; the first collision-free hit latches
    the CONCATENATED plan [RS(pose -> s), RS(s -> dest)] — both segments
    swept-collision-checked (the second at staging precompute), so the whole
    ride into the slot is verified.  This is what closes the hardest DLP
    cases: the direct endgame search from the current pose fails (thin
    validity manifold), but a two-segment decomposition through a staging
    pose exists and is found analytically instead of hoping iLQR wanders
    onto the manifold.

    Returns (hybrid', latched) — latched (B,) marks envs that adopted a plan.
    """
    from ..agents.hybrid import HybridState
    from .rs_select import RSPath, build_action_queue, find_path_batch

    cfg = env.cfg
    B = pose.shape[0]
    Q = hybrid.queue.shape[1]
    ar = jnp.arange(B)

    d = jnp.linalg.norm(pose[:, None, :2] - staging.poses[..., :2], axis=-1)
    # ``offset`` slides the candidate window down the cost ranking — the MPC
    # runner cycles it across replans so an episode eventually tries EVERY
    # valid staging pose, not just the 4 cheapest (which may all be
    # RS-unreachable from the approach side the car is on)
    order_full = jnp.argsort(d + staging.L, axis=1)          # (B, S)
    order = jax.lax.dynamic_slice_in_dim(
        order_full, offset, k_best, axis=1)                  # (B, K)

    found_any = jnp.zeros(B, bool)
    sel_rs1 = RSPath(found=jnp.zeros(B, bool), lengths=jnp.zeros((B, 5)),
                     steers=jnp.zeros((B, 5)), L=jnp.full(B, jnp.inf))
    sel_idx = jnp.zeros(B, jnp.int32)
    for k in range(k_best):
        s_idx = order[:, k]
        s_pose = staging.poses[ar, s_idx]
        rs1 = find_path_batch(
            pose, s_pose, cfg.vehicle.max_curvature, env.corners,
            scenes.edges, scenes.edge_mask, scenes.bounds,
            n_points=cfg.rs_max_points, step_m=cfg.rs_step_size,
            max_tries=cfg.rs_max_tries, use_pallas=env._pallas_mask,
        )
        ok = rs1.found & jnp.isfinite(staging.L[ar, s_idx]) & ~found_any
        sel_rs1 = RSPath(
            found=jnp.where(ok, True, sel_rs1.found),
            lengths=jnp.where(ok[:, None], rs1.lengths, sel_rs1.lengths),
            steers=jnp.where(ok[:, None], rs1.steers, sel_rs1.steers),
            L=jnp.where(ok, rs1.L, sel_rs1.L))
        sel_idx = jnp.where(ok, s_idx, sel_idx)
        found_any = found_any | ok

    rs2 = RSPath(found=found_any,
                 lengths=staging.lengths[ar, sel_idx],
                 steers=staging.steers[ar, sel_idx],
                 L=staging.L[ar, sel_idx])
    q1, n1 = jax.vmap(lambda p: build_action_queue(p, step_ratio, Q))(sel_rs1)
    q2, n2 = jax.vmap(lambda p: build_action_queue(p, step_ratio, Q))(rs2)
    qc, nc = jax.vmap(lambda a, b, c, e: concat_queues(a, b, c, e, Q))(
        q1, n1, q2, n2)

    take = found_any & active & ~hybrid.executing
    new = HybridState(
        queue=jnp.where(take[:, None, None], qc, hybrid.queue),
        length=jnp.where(take, nc, hybrid.length),
        cursor=jnp.where(take, 0, hybrid.cursor),
    )
    return new, take


def pick_goal(staging: StagingSet, pose, dest):
    """Per-replan approach target: the valid staging pose minimizing
    distance-to-go + RS completion length; the slot itself when none validate.

    Args:
      staging: precomputed StagingSet for the batch.
      pose: (B, 3) current vehicle poses.
      dest: (B, 3) slot poses.

    Returns:
      goal: (B, 3); has_staging: (B,) bool.
    """
    d = jnp.linalg.norm(
        pose[:, None, :2] - staging.poses[..., :2], axis=-1)   # (B, S)
    cost = d + staging.L
    best = jnp.argmin(cost, axis=1)
    has = jnp.isfinite(jnp.min(cost, axis=1))
    goal = staging.poses[jnp.arange(pose.shape[0]), best]
    return jnp.where(has[:, None], goal, dest), has
