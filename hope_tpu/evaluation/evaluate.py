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
from ..envs.rewards import COLLIDED, OUTBOUND, OUTTIME
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
            (state, obs, hybrid, finished, steps, path_len, status, last_tgt,
             ever_rs) = carry
            k_act, k_rand = jax.random.split(k)
            action, logp = policy_act(obs, k_act)
            # stuck detector: identical target obs twice -> random action.
            # last_tgt is the PREVIOUS step's target (carried below as
            # prev_tgt); carrying the post-step target instead would compare
            # the obs with itself and randomize every action — the round-2
            # eval bug that made batteries report random-policy numbers.
            stuck = jnp.all(jnp.abs(obs["target"] - last_tgt) < 1e-12, axis=-1)
            rand_a = jax.random.uniform(k_rand, action.shape, minval=-1.0, maxval=1.0)
            action = jnp.where(stuck[:, None], rand_a, action)
            prev_tgt = obs["target"]

            queued = hybrid.queue[jnp.arange(B),
                                  jnp.clip(hybrid.cursor, 0, hybrid.queue.shape[1] - 1)]
            action, _, hybrid = hybrid_act(hybrid, action, logp,
                                           policy_logp(obs, queued))

            prev_xy = jnp.stack([state.vehicle.x, state.vehicle.y], -1)
            new_state, new_obs, r, done, info = env.batch_step(
                state, env.rescale_action(action), search_rs=use_rs)
            if use_rs:
                hybrid = latch(hybrid, info["rs"], env.cfg.step_ratio)
                ever_rs = ever_rs | (info["rs"].found & ~finished)

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
                    prev_tgt, ever_rs), out

        # init last_tgt to +inf: the first step is never "stuck" (the
        # reference's last_obs starts empty, eval_utils.py:46-48)
        init = (state, obs, hybrid, jnp.zeros(B, bool), jnp.zeros(B, jnp.int32),
                jnp.zeros(B), jnp.full(B, -1, jnp.int32),
                jnp.full_like(obs["target"], jnp.inf),
                jnp.zeros(B, bool))
        (state, obs, hybrid, finished, steps, path_len, status, _,
         ever_rs), poses = jax.lax.scan(
            step_fn, init, jax.random.split(key, max_steps))
        extra = {"poses": poses} if record_traj else {}
        return extra | {
            "success": status == ARRIVED,
            "steps": steps,
            "path_length": path_len,
            "status": status,
            "finished": finished,
            "rs_latched": ever_rs,
            "level": scenes.level,
            "case_id": scenes.case_id,
        }

    return run


def summarize(metrics: dict, max_steps: int = 200) -> dict:
    """Reference result.txt-style summary (eval_utils.py:85-148).

    ``max_steps`` must match the cap the runner was built with — path-length
    stats are reported only for episodes that finished within the cap
    (eval_utils.py:64-66).
    """
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
    status = np.asarray(metrics["status"])
    rs = np.asarray(metrics.get("rs_latched", np.zeros_like(succ)))
    for lv in np.unique(level):
        m = level == lv
        name = LEVEL_NAMES.get(int(lv), str(lv))
        # path length reported for completed-within-cap episodes (ref :64-66)
        short = m & (steps < max_steps)
        out["per_level"][name] = {
            "n": int(m.sum()),
            "success_rate": float(succ[m].mean()),
            "steps_mean": float(steps[m].mean()),
            "path_length_mean": float(plen[short].mean()) if short.any() else None,
            # failure-mode breakdown + hybrid diagnostics (not in the
            # reference's result.txt, but essential to see WHY a level fails)
            "collided": float((status[m] == COLLIDED).mean()),
            "outbound": float((status[m] == OUTBOUND).mean()),
            "outtime": float(
                (~np.asarray(metrics["finished"])[m]
                 | (status[m] == OUTTIME)).mean()),
            "rs_latched": float(rs[m].mean()),
        }
        if "way_latched" in metrics:
            out["per_level"][name]["way_latched"] = float(
                np.asarray(metrics["way_latched"])[m].mean())
    return out


def write_report(path: str, summary: dict):
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
