"""Batched evaluation battery (reference evaluation/eval_utils.py).

Whole scenario batteries roll out in lockstep on device: finished episodes
freeze in place while the rest continue, and the reference's per-case metrics
(success rate, steps, path length, per-level splits) are reduced at the end.
Includes the stuck detector (identical target obs twice -> random action,
eval_utils.py:46-48) and the RS-takeover latch.
"""
from __future__ import annotations

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import HybridState, hybrid_act, latch
from ..envs import ARRIVED, ParkingEnv
from ..envs.scene import LEVEL_NAMES, Scene


def build_episode_runner(env: ParkingEnv, policy_act, policy_logp,
                         max_steps: int = 200, use_rs: bool = True,
                         record_traj: bool = False):
    """policy_act(obs, key) -> (action, logp); policy_logp(obs, action) -> logp.

    Returns a jitted function: scenes -> metrics dict with per-env success,
    steps, path_length, final status (+ "poses" (T, B, 3) when
    ``record_traj`` — for human rendering via evaluation.render).
    """

    @jax.jit
    def run(scenes: Scene, key):
        state, obs = env.batch_reset(scenes)
        B = obs["target"].shape[0]
        hybrid = HybridState.create(B, env.cfg.rs_queue_len)

        def step_fn(carry, k):
            state, obs, hybrid, finished, steps, path_len, status, last_tgt = carry
            k_act, k_rand = jax.random.split(k)
            action, logp = policy_act(obs, k_act)
            # stuck detector: identical target obs twice -> random action
            stuck = jnp.all(jnp.abs(obs["target"] - last_tgt) < 1e-12, axis=-1)
            rand_a = jax.random.uniform(k_rand, action.shape, minval=-1.0, maxval=1.0)
            action = jnp.where(stuck[:, None], rand_a, action)

            queued = hybrid.queue[jnp.arange(B),
                                  jnp.clip(hybrid.cursor, 0, hybrid.queue.shape[1] - 1)]
            action, _, hybrid = hybrid_act(hybrid, action, logp,
                                           policy_logp(obs, queued))

            prev_xy = jnp.stack([state.vehicle.x, state.vehicle.y], -1)
            new_state, new_obs, r, done, info = env.batch_step(
                state, env.rescale_action(action), search_rs=use_rs)
            if use_rs:
                hybrid = latch(hybrid, info["rs"], env.cfg.step_ratio)

            new_xy = jnp.stack([new_state.vehicle.x, new_state.vehicle.y], -1)
            moved = jnp.linalg.norm(new_xy - prev_xy, axis=-1)

            active = ~finished
            steps = steps + active.astype(jnp.int32)
            path_len = path_len + jnp.where(active, moved, 0.0)
            status = jnp.where(active & done, info["status"], status)
            finished = finished | done

            # freeze finished envs
            sel = lambda a, b: jax.tree.map(  # noqa: E731
                lambda x, y: jnp.where(
                    finished.reshape((B,) + (1,) * (x.ndim - 1)), x, y), a, b)
            state = sel(state, new_state)
            obs = sel(obs, new_obs)
            out = state.vehicle.pose if record_traj else None
            return (state, obs, hybrid, finished, steps, path_len, status,
                    obs["target"]), out

        init = (state, obs, hybrid, jnp.zeros(B, bool), jnp.zeros(B, jnp.int32),
                jnp.zeros(B), jnp.full(B, -1, jnp.int32), obs["target"])
        (state, obs, hybrid, finished, steps, path_len, status, _), poses = jax.lax.scan(
            step_fn, init, jax.random.split(key, max_steps))
        extra = {"poses": poses} if record_traj else {}
        return extra | {
            "success": status == ARRIVED,
            "steps": steps,
            "path_length": path_len,
            "status": status,
            "finished": finished,
            "level": scenes.level,
            "case_id": scenes.case_id,
        }

    return run


def summarize(metrics: dict) -> dict:
    """Reference result.txt-style summary (eval_utils.py:85-148)."""
    succ = np.asarray(metrics["success"])
    steps = np.asarray(metrics["steps"])
    plen = np.asarray(metrics["path_length"])
    level = np.asarray(metrics["level"])
    out = {
        "success_rate": float(succ.mean()),
        "n": int(len(succ)),
        "success_steps_mean": float(steps[succ].mean()) if succ.any() else None,
        "success_steps_std": float(steps[succ].std()) if succ.any() else None,
        "per_level": {},
    }
    for lv in np.unique(level):
        m = level == lv
        name = LEVEL_NAMES.get(int(lv), str(lv))
        # path length reported for completed-within-cap episodes (ref :64-66)
        short = m & (steps < 200)
        out["per_level"][name] = {
            "n": int(m.sum()),
            "success_rate": float(succ[m].mean()),
            "steps_mean": float(steps[m].mean()),
            "path_length_mean": float(plen[short].mean()) if short.any() else None,
        }
    return out


def write_report(path: str, summary: dict):
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
