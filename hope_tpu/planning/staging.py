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

# slot-axis offsets (m) tried on both sides of the slot, lateral offsets for
# parallel-style approaches, and the four axis-aligned candidate headings
_AXIAL = (2.5, 4.0, 6.0)
_LATERAL = (2.5, 4.0)
_HEADINGS = (0.0, jnp.pi, jnp.pi / 2, -jnp.pi / 2)


def staging_candidates(dest) -> jnp.ndarray:
    """Fixed candidate staging poses for one scenario.

    Args:
      dest: (3,) slot pose [x, y, heading].

    Returns:
      (S, 3) candidate poses, S = len(_AXIAL)*2*4 + len(_LATERAL)*2*2.
    """
    thd = dest[2]
    u = jnp.stack([jnp.cos(thd), jnp.sin(thd)])          # slot axis
    w = jnp.stack([-jnp.sin(thd), jnp.cos(thd)])         # slot normal
    poses = []
    for d in _AXIAL:
        for sd in (1.0, -1.0):
            xy = dest[:2] + sd * d * u
            for h in _HEADINGS:
                poses.append(jnp.concatenate([xy, (thd + h)[None]]))
    for dw in _LATERAL:
        for sw in (1.0, -1.0):
            xy = dest[:2] + sw * dw * w
            for h in (0.0, jnp.pi):
                poses.append(jnp.concatenate([xy, (thd + h)[None]]))
    return jnp.stack(poses)                              # (S, 3)


N_STAGING = len(_AXIAL) * 2 * len(_HEADINGS) + len(_LATERAL) * 2 * 2


class StagingSet(NamedTuple):
    poses: jnp.ndarray   # (B, S, 3)
    L: jnp.ndarray       # (B, S) RS completion length, +inf where invalid


def compute_staging(env, scenes, max_tries: int = 6) -> StagingSet:
    """Validate every candidate's RS completion against the scene obstacles.

    One batched RS search per candidate slot (scanned, so memory stays at the
    per-candidate level); a candidate is valid iff a collision-free RS path
    staging -> dest exists within ``max_tries`` shortest words.
    """
    cfg = env.cfg
    cands = jax.vmap(staging_candidates)(scenes.dest)    # (B, S, 3)

    def body(_, s_pose):                                 # s_pose: (B, 3)
        rs = find_path_batch(
            s_pose, scenes.dest, cfg.vehicle.max_curvature, env.corners,
            scenes.edges, scenes.edge_mask, scenes.bounds,
            n_points=cfg.rs_max_points, step_m=cfg.rs_step_size,
            max_tries=max_tries, use_pallas=env._pallas_mask,
        )
        return None, (rs.found, rs.L)

    _, (valid, L) = jax.lax.scan(
        body, None, jnp.transpose(cands, (1, 0, 2)))     # (S, B)
    valid = valid.T                                      # (B, S)
    L = jnp.where(valid, L.T, jnp.inf)
    return StagingSet(poses=cands, L=L)


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
