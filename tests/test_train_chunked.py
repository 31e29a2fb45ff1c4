"""Chunked trainer: one executable, stable avals, correct bookkeeping."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.agents import HybridState, SACAgent, PPOAgent, replay_create
from hope_tpu.config import (
    EnvConfig,
    ObsConfig,
    PPOConfig,
    SACConfig,
    actor_net_config,
    critic_net_config,
)
from hope_tpu.envs import ParkingEnv
from hope_tpu.envs.scenario_gen import generate_bank
from hope_tpu.train.chunked import build_ppo_chunk, build_sac_chunk, summarize_logs
from hope_tpu.train.scene_pool import pad_scene_batch


def _setup(B=4, pool_n=8):
    obs_cfg = ObsConfig(use_img=False, mask_backend="xla")
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=96, max_obstacles=32,
                        rs_max_points=64)
    env = ParkingEnv(env_cfg)
    scenes, _ = generate_bank(jax.random.PRNGKey(0), level="Normal", n=pool_n)
    pool = pad_scene_batch(scenes, env_cfg.max_edges, env_cfg.max_obstacles)
    pool_idx = jnp.arange(B, dtype=jnp.int32)
    start = jax.tree.map(lambda x: x[:B], pool)
    env_state, obs = env.batch_reset(start)
    hybrid = HybridState.create(B, env_cfg.rs_queue_len)
    return env, env_cfg, pool, pool_idx, env_state, obs, hybrid


def _transition_example(obs):
    ex = {}
    for k, v in obs.items():
        ex[f"obs/{k}"] = v[0]
        ex[f"next_obs/{k}"] = v[0]
    ex["action"] = jnp.zeros(2)
    ex["reward"] = jnp.zeros(())
    ex["done"] = jnp.zeros((), bool)
    ex["log_prob"] = jnp.zeros(())
    return ex


def test_sac_chunk_single_compile_and_logs():
    env, env_cfg, pool, pool_idx, env_state, obs, hybrid = _setup()
    B, K = 4, 3
    agent = SACAgent(actor_net_config(env.cfg.obs),
                     critic_net_config(env.cfg.obs, action_input=True),
                     SACConfig(memory_size=64, batch_size=8),
                     env.observation_shape, env.mask_table)
    sac_state = agent.init(jax.random.PRNGKey(1))
    replay = replay_create(64, _transition_example(obs))
    chunk = build_sac_chunk(env, agent, env_cfg.step_ratio, K,
                            updates_per_chunk=1, sgd_batch=8)
    reset_queue = jnp.arange(B * K, dtype=jnp.int32) % pool.start.shape[0]

    args = (sac_state, env_state, hybrid, obs, pool_idx, replay)
    for i in range(3):
        out = chunk(*args, pool, reset_queue, jax.random.PRNGKey(10 + i),
                    warmup=False)
        args = out[:6]
        logs, metrics = out[6], out[7]

    # aval churn would show as >1 cached executable for the single
    # (warmup=False) static signature
    assert chunk._cache_size() == 1, (
        f"chunk recompiled: {chunk._cache_size()} executables for one signature")

    assert logs["done"].shape == (K, B)
    assert logs["reward"].shape == (K, B)
    s = summarize_logs(jax.tree.map(np.asarray, logs))
    assert s["episodes"] == len(s["ends"])
    assert "actor_loss" in metrics
    # replay advanced by K * B pushes per chunk
    assert int(out[5].size) == min(3 * K * B, 64)


def test_sac_chunk_resets_consume_queue():
    env, env_cfg, pool, pool_idx, env_state, obs, hybrid = _setup()
    B, K = 4, 8
    agent = SACAgent(actor_net_config(env.cfg.obs),
                     critic_net_config(env.cfg.obs, action_input=True),
                     SACConfig(memory_size=64, batch_size=8),
                     env.observation_shape, env.mask_table)
    sac_state = agent.init(jax.random.PRNGKey(1))
    replay = replay_create(64, _transition_example(obs))
    chunk = build_sac_chunk(env, agent, env_cfg.step_ratio, K,
                            updates_per_chunk=1, sgd_batch=8)
    # all queue entries point at pool slot 7: any env that finishes must
    # switch to scene 7
    reset_queue = jnp.full((B * K,), 7, jnp.int32)
    out = chunk(sac_state, env_state, hybrid, obs, pool_idx, replay,
                pool, reset_queue, jax.random.PRNGKey(5), warmup=True)
    new_pool_idx, logs = out[4], out[6]
    done_any = np.asarray(logs["done"]).any(axis=0)
    got = np.asarray(new_pool_idx)
    assert np.all(got[done_any] == 7)
    assert np.all(got[~done_any] == np.arange(4)[~done_any])


def test_ppo_chunk_runs_and_updates():
    env, env_cfg, pool, pool_idx, env_state, obs, hybrid = _setup()
    B, T = 4, 8
    agent = PPOAgent(actor_net_config(env.cfg.obs),
                     critic_net_config(env.cfg.obs),
                     PPOConfig(mini_batch=8, mini_epoch=2),
                     env.observation_shape, env.mask_table)
    ppo_state = agent.init(jax.random.PRNGKey(2))
    chunk = build_ppo_chunk(env, agent, env_cfg.step_ratio, T)
    reset_queue = jnp.zeros(B * T, jnp.int32)

    args = (ppo_state, env_state, hybrid, obs, pool_idx)
    for i in range(2):
        out = chunk(*args, pool, reset_queue, jax.random.PRNGKey(20 + i))
        args = out[:5]
    assert chunk._cache_size() == 1
    ppo_state, logs, metrics = out[0], out[5], out[6]
    assert logs["done"].shape == (T, B)
    assert np.isfinite(float(metrics["actor_loss"]))
    assert int(ppo_state.steps) == 2
