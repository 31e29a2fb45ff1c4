"""Checkpoint round-trip + partial restores (reference agent_base.py:94-130
params_only load, ppo_agent.py:400-415 load_actor)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.agents import SACAgent
from hope_tpu.config import ObsConfig, SACConfig, actor_net_config, critic_net_config
from hope_tpu.utils.checkpoint import (
    load_actor_only,
    load_checkpoint,
    load_params_only,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def agent_and_state():
    obs_cfg = ObsConfig(use_img=False)
    obs_shape = {"lidar": (120,), "action_mask": (42,), "target": (5,)}
    agent = SACAgent(actor_net_config(obs_cfg),
                     critic_net_config(obs_cfg, action_input=True),
                     SACConfig(), obs_shape)
    state = agent.init(jax.random.PRNGKey(0))
    return agent, state


def _mutate(state, scale=2.0):
    """A distinguishable variant of every leaf."""
    return jax.tree.map(
        lambda x: x * scale if jnp.issubdtype(x.dtype, jnp.floating) else x + 1,
        state)


def test_roundtrip(tmp_path, agent_and_state):
    _, state = agent_and_state
    save_checkpoint(str(tmp_path / "ck"), state, step=3)
    other = _mutate(state)
    restored = load_checkpoint(str(tmp_path / "ck"), other)  # picks max step
    jax.tree.map(np.testing.assert_array_equal, restored, state)


def test_params_only_keeps_optimizers(tmp_path, agent_and_state):
    _, state = agent_and_state
    save_checkpoint(str(tmp_path / "ck"), state, step=1)
    current = _mutate(state)
    restored = load_params_only(str(tmp_path / "ck"), current)
    # nets come from the checkpoint...
    jax.tree.map(np.testing.assert_array_equal, restored.actor, state.actor)
    np.testing.assert_array_equal(restored.log_alpha, state.log_alpha)
    # ...optimizer slots stay the run's own
    jax.tree.map(np.testing.assert_array_equal, restored.opt_actor,
                 current.opt_actor)


def test_actor_only(tmp_path, agent_and_state):
    _, state = agent_and_state
    save_checkpoint(str(tmp_path / "ck"), state, step=1)
    current = _mutate(state)
    restored = load_actor_only(str(tmp_path / "ck"), current)
    jax.tree.map(np.testing.assert_array_equal, restored.actor, state.actor)
    np.testing.assert_array_equal(restored.log_std, state.log_std)
    # critics untouched
    jax.tree.map(np.testing.assert_array_equal, restored.critic1,
                 current.critic1)
