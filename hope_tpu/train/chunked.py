"""Fully-jitted training chunks: K lockstep env steps + auto-resets +
(optionally) the SGD updates, in ONE device call.

The reference steps one env per Python-loop iteration
(train/train_HOPE_sac.py:177-213).  Round 1 of this framework batched the envs
but still made one device call per control step and bounced episode resets
through the host, which (a) pays the remote-tunnel dispatch latency every step
and (b) recompiles the reset path for every distinct count of finished envs.
Here the whole collect loop is a ``lax.scan`` inside one jit:

- resets come from a device-resident scenario pool through a pre-sampled
  ``reset_queue`` of pool indices (the host's curriculum fills the queue
  between chunks, one chunk behind — the per-episode curriculum statistics the
  reference keeps are reconstructed from the (K, B) done/status logs each
  chunk returns);
- the SAC variant then runs its off-policy updates from the on-device replay
  ring in the same call; the PPO variant stacks the (K, B) on-policy buffer
  and runs its full update in-call as well.

All big carries are donated, so replay/env state never copy.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..agents import hybrid_act, hybrid_reset_done, latch, normalize, norm_update
from ..agents.replay import push_batch, sample as replay_sample
from ..envs import ParkingEnv
from ..envs.rewards import ARRIVED


def _collect_step(env: ParkingEnv, step_ratio, act_fn, log_prob_fn):
    """One env step of the chunk scan, shared by SAC and PPO.

    act_fn(agent_state, obs, key) -> (action, logp)
    log_prob_fn(agent_state, obs, action) -> logp
    """

    def step(agent_state, env_state, hybrid, obs, pool_idx, rctr,
             pool, reset_queue, key):
        B = obs["target"].shape[0]

        policy_action, policy_logp = act_fn(agent_state, obs, key)
        queued = hybrid.queue[jnp.arange(B),
                              jnp.clip(hybrid.cursor, 0, hybrid.queue.shape[1] - 1)]
        queued_logp = log_prob_fn(agent_state, obs, queued)
        action, logp, hybrid = hybrid_act(hybrid, policy_action, policy_logp,
                                          queued_logp)

        phys = env.rescale_action(action)
        new_env, reward, done, info = jax.vmap(
            partial(env._transition, search_rs=False))(env_state, phys)
        rs = env._batch_rs(new_env)
        hybrid = latch(hybrid, rs, step_ratio)
        hybrid = hybrid_reset_done(hybrid, done)

        # episode log BEFORE the reset swap: which pool scene just finished
        log = {"done": done, "status": info["status"], "pool_idx": pool_idx,
               "reward": reward}

        # queue-fed auto-reset: the j-th env finishing this step consumes
        # reset_queue[(rctr + j) % R]
        R = reset_queue.shape[0]
        order = jnp.cumsum(done.astype(jnp.int32)) - 1
        fresh_idx = reset_queue[(rctr + order) % R]
        pool_idx = jnp.where(done, fresh_idx, pool_idx)
        rctr = rctr + jnp.sum(done.astype(jnp.int32))

        scene = jax.tree.map(lambda x: x[pool_idx], pool)
        fresh_state = jax.vmap(env._init_state)(scene)
        env_state = ParkingEnv.reset_where(new_env, fresh_state, done)

        # one observation render per step: post-step for running envs,
        # first-obs for freshly reset ones (the stored next_obs of a done
        # transition is never used in targets — masked by (1 - done))
        next_obs = env.observe_batch(env_state)
        return (env_state, hybrid, next_obs, pool_idx, rctr,
                action, logp, reward, done, log)

    return step


def _flatten_transition(obs_n, next_obs_n, action, reward, done, logp):
    tr = {f"obs/{k}": v for k, v in obs_n.items()}
    tr.update({f"next_obs/{k}": v for k, v in next_obs_n.items()})
    tr["action"] = action
    tr["reward"] = reward
    tr["done"] = done
    tr["log_prob"] = logp
    return tr


def build_sac_chunk(env: ParkingEnv, agent, step_ratio: float,
                    chunk_steps: int, updates_per_chunk: int, sgd_batch: int):
    """One jitted SAC chunk: K collect steps + U in-call updates.

    chunk(sac_state, env_state, hybrid, obs, pool_idx, replay,
          pool, reset_queue, key, warmup) ->
      (sac_state, env_state, hybrid, obs, pool_idx, replay,
       logs {(K,B) done/status/pool_idx/reward}, metrics)
    """

    @partial(jax.jit, static_argnames=("warmup",), donate_argnums=(0, 1, 2, 3, 4, 5))
    def chunk(sac_state, env_state, hybrid, obs, pool_idx, replay,
              pool, reset_queue, key, warmup: bool):
        def act_fn(state, o, k):
            if warmup:
                B = o["target"].shape[0]
                a = jax.random.uniform(k, (B, agent.cfg.action_dim),
                                       minval=-1.0, maxval=1.0)
                return a, agent.log_prob(state, o, a)
            a, lp = agent.get_action(state, o, k)
            eps = getattr(agent.cfg, "explore_epsilon", 0.0)
            if eps > 0.0:
                # epsilon-greedy mix-in (reference env_wrapper.action_rescale
                # :37-50 / agent_base.epsilon_greedy :76-79)
                k1, k2 = jax.random.split(jax.random.fold_in(k, 7))
                rand_a = jax.random.uniform(k1, a.shape, minval=-1.0, maxval=1.0)
                take = jax.random.bernoulli(k2, eps, (a.shape[0],))
                a = jnp.where(take[:, None], rand_a, a)
                lp = jnp.where(take, agent.log_prob(state, o, rand_a), lp)
            return a, lp

        step = _collect_step(env, step_ratio, act_fn, agent.log_prob)

        def body(carry, k):
            sac_state, env_state, hybrid, obs, pool_idx, rctr, replay = carry
            (env_state, hybrid, next_obs, pool_idx, rctr,
             action, logp, reward, done, log) = step(
                sac_state, env_state, hybrid, obs, pool_idx, rctr,
                pool, reset_queue, k)

            # normalized push: obs with current stats, stats updated on
            # next_obs (reference sac_agent.py:209-219)
            obs_n = normalize(obs, sac_state.norm)
            new_norm = norm_update(sac_state.norm, next_obs)
            sac_state = sac_state.replace(norm=new_norm)
            next_obs_n = normalize(next_obs, new_norm)
            replay = push_batch(replay, _flatten_transition(
                obs_n, next_obs_n, action, reward, done, logp))

            return (sac_state, env_state, hybrid, next_obs, pool_idx, rctr,
                    replay), log

        rctr = jnp.zeros((), jnp.int32)
        keys = jax.random.split(jax.random.fold_in(key, 0), chunk_steps)
        (sac_state, env_state, hybrid, obs, pool_idx, rctr, replay), logs = \
            jax.lax.scan(body, (sac_state, env_state, hybrid, obs, pool_idx,
                                rctr, replay), keys)

        metrics = {}
        if not warmup:
            def upd(st, k):
                mb = replay_sample(replay, k, sgd_batch)
                st, m = agent.update(st, mb, jax.random.fold_in(k, 1))
                return st, m

            sac_state, ms = jax.lax.scan(
                upd, sac_state,
                jax.random.split(jax.random.fold_in(key, 1), updates_per_chunk))
            metrics = jax.tree.map(lambda x: x[-1], ms)

        return sac_state, env_state, hybrid, obs, pool_idx, replay, logs, metrics

    return chunk


def build_ppo_chunk(env: ParkingEnv, agent, step_ratio: float,
                    chunk_steps: int):
    """One jitted PPO chunk: K masked-action collect steps + the full
    (K x B)-buffer PPO update, in one call (reference buffer-full trigger,
    train_HOPE_ppo.py:199-204)."""

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def chunk(ppo_state, env_state, hybrid, obs, pool_idx,
              pool, reset_queue, key):
        step = _collect_step(env, step_ratio, agent.choose_action,
                             agent.log_prob)

        def body(carry, k):
            ppo_state, env_state, hybrid, obs, pool_idx, rctr = carry
            (env_state, hybrid, next_obs, pool_idx, rctr,
             action, logp, reward, done, log) = step(
                ppo_state, env_state, hybrid, obs, pool_idx, rctr,
                pool, reset_queue, k)

            obs_n = normalize(obs, ppo_state.norm)
            new_norm = norm_update(ppo_state.norm, next_obs)
            ppo_state = ppo_state.replace(norm=new_norm)
            next_obs_n = normalize(next_obs, new_norm)
            tr = _flatten_transition(obs_n, next_obs_n, action, reward, done,
                                     logp)
            return (ppo_state, env_state, hybrid, next_obs, pool_idx,
                    rctr), (tr, log)

        rctr = jnp.zeros((), jnp.int32)
        keys = jax.random.split(jax.random.fold_in(key, 0), chunk_steps)
        (ppo_state, env_state, hybrid, obs, pool_idx, rctr), (buffer, logs) = \
            jax.lax.scan(body, (ppo_state, env_state, hybrid, obs, pool_idx,
                                rctr), keys)

        ppo_state, metrics = agent.update(ppo_state, buffer,
                                          jax.random.fold_in(key, 1))
        return ppo_state, env_state, hybrid, obs, pool_idx, logs, metrics

    return chunk


def summarize_logs(logs) -> dict:
    """Host-side episode bookkeeping from a chunk's (K, B) logs.

    Returns numpy scalars/lists — feed ``ends`` [(pool_idx, success), ...] in
    episode-end order to the curriculum choosers.
    """
    import numpy as np

    done = np.asarray(logs["done"])                    # (K, B)
    status = np.asarray(logs["status"])
    pool_idx = np.asarray(logs["pool_idx"])
    k, b = np.nonzero(done)
    success = status[k, b] == ARRIVED
    return {
        "episodes": int(done.sum()),
        "successes": int(success.sum()),
        "ends": list(zip(pool_idx[k, b].tolist(), success.tolist())),
        "reward_mean": float(np.asarray(logs["reward"]).mean()),
    }
