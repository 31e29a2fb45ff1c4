"""PPO distribution families (reference ppo_agent.py:119-144)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.config import ObsConfig, PPOConfig, actor_net_config, critic_net_config
from hope_tpu.agents import PPOAgent
from hope_tpu.envs.action_mask import build_table


OBS_SHAPE = {"lidar": (120,), "target": (5,), "action_mask": (42,)}


def _obs(key, B=6):
    k1, k2 = jax.random.split(key)
    return {
        "lidar": jax.random.uniform(k1, (B, 120)) * 10,
        "target": jax.random.normal(k2, (B, 5)),
        "action_mask": jnp.ones((B, 42)),
    }


def _agent(dist_type):
    obs_cfg = ObsConfig(use_img=False)
    cfg = PPOConfig(dist_type=dist_type, mini_batch=6, mini_epoch=2)
    return PPOAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg),
                    cfg, OBS_SHAPE, build_table())


@pytest.mark.parametrize("dist_type", ["gaussian", "beta", "categorical"])
def test_act_logprob_update(dist_type):
    agent = _agent(dist_type)
    st = agent.init(jax.random.PRNGKey(0))
    obs = _obs(jax.random.PRNGKey(1))

    a, logp = agent.get_action(st, obs, jax.random.PRNGKey(2))
    assert a.shape == (6, 2)
    assert np.all(np.abs(np.asarray(a)) <= 1.0 + 1e-6)
    assert np.all(np.isfinite(np.asarray(logp)))
    # log_prob of the sampled action matches the sampling-time value
    lp2 = agent.log_prob(st, obs, a)
    np.testing.assert_allclose(np.asarray(lp2), np.asarray(logp), rtol=1e-4,
                               atol=1e-5)

    am, logpm = agent.choose_action(st, obs, jax.random.PRNGKey(3))
    assert am.shape == (6, 2)
    # masked projection picks discrete-table actions
    table = np.asarray(agent.mask_table.actions_norm)
    d = np.min(np.linalg.norm(np.asarray(am)[:, None] - table, axis=-1), -1)
    assert np.max(d) < 1e-5

    # full update on a tiny (T, B) buffer
    T, B = 4, 6
    buf = {}
    for k, shp in OBS_SHAPE.items():
        buf[f"obs/{k}"] = jnp.zeros((T, B) + shp)
        buf[f"next_obs/{k}"] = jnp.zeros((T, B) + shp)
    buf["action"] = jnp.tile(a, (T, 1, 1))
    buf["reward"] = jnp.ones((T, B)) * 0.1
    buf["done"] = jnp.zeros((T, B), bool)
    buf["log_prob"] = jnp.tile(logp, (T, 1))
    st2, metrics = agent.update(st, buf, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["actor_loss"]))
    assert np.isfinite(float(metrics["critic_loss"]))
    # params actually moved
    moved = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), st.actor, st2.actor)
    assert max(jax.tree.leaves(moved)) > 0.0


def test_categorical_masked_sampling_respects_mask():
    agent = _agent("categorical")
    st = agent.init(jax.random.PRNGKey(0))
    obs = _obs(jax.random.PRNGKey(1))
    # only action 5 allowed
    mask = jnp.zeros((6, 42)).at[:, 5].set(1.0)
    obs["action_mask"] = mask
    a, _ = agent.choose_action(st, obs, jax.random.PRNGKey(2))
    want = np.asarray(agent.mask_table.actions_norm)[5]
    np.testing.assert_allclose(np.asarray(a), np.tile(want, (6, 1)), atol=1e-6)


def test_beta_moments_in_range():
    agent = _agent("beta")
    st = agent.init(jax.random.PRNGKey(0))
    obs = _obs(jax.random.PRNGKey(1))
    raw = agent._raw(st.actor, st, obs)
    mean, std = agent._moments(raw, st.log_std)
    assert np.all(np.abs(np.asarray(mean)) <= 1.0)
    assert np.all(np.asarray(std) > 0)


def _tiny_buffer(agent, st, key):
    T, B = 4, 6
    obs = _obs(jax.random.PRNGKey(1))
    a, logp = agent.get_action(st, obs, jax.random.PRNGKey(2))
    buf = {}
    for k, shp in OBS_SHAPE.items():
        buf[f"obs/{k}"] = jnp.zeros((T, B) + shp)
        buf[f"next_obs/{k}"] = jnp.zeros((T, B) + shp)
    buf["action"] = jnp.tile(a, (T, 1, 1))
    buf["reward"] = jnp.ones((T, B)) * 0.1
    buf["done"] = jnp.zeros((T, B), bool)
    buf["log_prob"] = jnp.tile(logp, (T, 1))
    return buf


def test_target_kl_guard_freezes_params():
    """With an always-tripped guard (target_kl < 0) NO minibatch applies: the
    whole state — params AND optimizer slots — round-trips unchanged, and the
    kl_stopped metric reports the stop."""
    obs_cfg = ObsConfig(use_img=False)
    cfg = PPOConfig(mini_batch=6, mini_epoch=2, target_kl=-1.0)
    agent = PPOAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg),
                     cfg, OBS_SHAPE, build_table())
    st = agent.init(jax.random.PRNGKey(0))
    buf = _tiny_buffer(agent, st, jax.random.PRNGKey(1))
    st2, metrics = agent.update(st, buf, jax.random.PRNGKey(4))
    assert float(metrics["kl_stopped"]) == 1.0
    for name in ("actor", "critic", "log_std", "opt_actor", "opt_critic"):
        same = jax.tree.map(
            lambda x, y: bool(jnp.all(x == y)),
            getattr(st, name), getattr(st2, name))
        assert all(jax.tree.leaves(same)), f"{name} moved despite KL stop"


def test_gradient_clip_global_norm():
    """gradient_clip=True must keep updates finite and small-step (reference
    clips the GLOBAL norm at 0.5, ppo_agent.py:334-336) and still move params
    when the guard is off."""
    obs_cfg = ObsConfig(use_img=False)
    cfg = PPOConfig(mini_batch=6, mini_epoch=2, gradient_clip=True)
    agent = PPOAgent(actor_net_config(obs_cfg), critic_net_config(obs_cfg),
                     cfg, OBS_SHAPE, build_table())
    st = agent.init(jax.random.PRNGKey(0))
    buf = _tiny_buffer(agent, st, jax.random.PRNGKey(1))
    st2, metrics = agent.update(st, buf, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["actor_loss"]))
    moved = jax.tree.map(
        lambda x, y: float(jnp.max(jnp.abs(x - y))), st.actor, st2.actor)
    assert max(jax.tree.leaves(moved)) > 0.0
