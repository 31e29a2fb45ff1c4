"""Vectorized hybrid RL + Reeds-Shepp parking agent.

Reference ``model/agent/parking_agent.py``: when a collision-free RS path has
been latched, actions pop from its queue (log-prob'd under the current policy so
transitions stay usable for training); otherwise the RL policy acts.  Here the
queue is a fixed (B, Q, 2) array with per-env cursors, so a whole scenario batch
mixes RS-following and policy-driven envs in lockstep.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..planning import RSPath, build_action_queue


@flax.struct.dataclass
class HybridState:
    queue: jnp.ndarray      # (B, Q, 2) normalized [steer, speed]
    length: jnp.ndarray     # (B,) live entries
    cursor: jnp.ndarray     # (B,) next entry to pop

    @staticmethod
    def create(batch: int, queue_len: int = 32) -> "HybridState":
        return HybridState(
            queue=jnp.zeros((batch, queue_len, 2)),
            length=jnp.zeros(batch, jnp.int32),
            cursor=jnp.zeros(batch, jnp.int32),
        )

    @property
    def executing(self):
        return self.cursor < self.length


def latch(hs: HybridState, rs: RSPath, step_ratio: float) -> HybridState:
    """Adopt found RS paths for envs not already executing one
    (reference set_planner_path :65-69 — non-forced)."""
    q, n = jax.vmap(lambda p: build_action_queue(p, step_ratio, hs.queue.shape[1]))(rs)
    take = rs.found & ~hs.executing
    return HybridState(
        queue=jnp.where(take[:, None, None], q, hs.queue),
        length=jnp.where(take, n, hs.length),
        cursor=jnp.where(take, 0, hs.cursor),
    )


def act(hs: HybridState, policy_action, policy_logp, logp_of_queue_action):
    """Merge policy actions with queued RS actions.

    Args:
      policy_action: (B, 2) the RL action (already sampled).
      policy_logp: (B,) its log-prob.
      logp_of_queue_action: (B,) log-prob of the queued action under the
        current policy (reference choose_action :78-95).

    Returns (action, log_prob, new_state).
    """
    ex = hs.executing
    b = hs.queue.shape[0]
    queued = hs.queue[jnp.arange(b), jnp.clip(hs.cursor, 0, hs.queue.shape[1] - 1)]
    action = jnp.where(ex[:, None], queued, policy_action)
    logp = jnp.where(ex, logp_of_queue_action, policy_logp)
    new = hs.replace(cursor=jnp.where(ex, hs.cursor + 1, hs.cursor))
    return action, logp, new


def reset_done(hs: HybridState, done) -> HybridState:
    """Clear queues of finished envs (reference ParkingAgent.reset)."""
    return hs.replace(
        length=jnp.where(done, 0, hs.length),
        cursor=jnp.where(done, 0, hs.cursor),
    )
