"""Shared one-chunk SAC fixture for sharded-equivalence tests — used both by
the single-process 8-virtual-device test (test_parallel.py) and by the
2-process jax.distributed workers (test_multihost.py), so the multi-process
run is compared against exactly the same computation."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.agents import HybridState, SACAgent, replay_create
from hope_tpu.config import (EnvConfig, ObsConfig, SACConfig,
                             actor_net_config, critic_net_config)
from hope_tpu.envs import ParkingEnv, make_scene, stack_scenes
from hope_tpu.geometry import pose_to_box
from hope_tpu.train.chunked import build_sac_chunk

B = 16


def make_env_agent():
    obs_cfg = ObsConfig(use_img=False, mask_backend="xla")
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=32, max_obstacles=4,
                        rs_max_points=64, rs_max_tries=2)
    env = ParkingEnv(env_cfg)
    agent = SACAgent(actor_net_config(obs_cfg),
                     critic_net_config(obs_cfg, action_input=True),
                     SACConfig(), env.observation_shape, env.mask_table)
    return env_cfg, env, agent


def build_inputs(env_cfg, env, agent):
    corners = jnp.asarray(env_cfg.vehicle.box_corners())
    room = np.array([[-8.0, -8], [8, -8], [8, 8], [-8, 8]])
    dest = [3.0, 0.0, 0.0]
    dest_box = np.asarray(pose_to_box(jnp.asarray(dest), corners))
    scene = make_scene([room], [0.0, 0.0, 0.0], dest, [-10, 10, -10, 10], 0, 0,
                       dest_box, max_edges=32, max_polys=4)
    scenes = stack_scenes([scene] * B)
    env_state, obs = env.batch_reset(scenes)
    hybrid = HybridState.create(B, env_cfg.rs_queue_len)
    sac_state = agent.init(jax.random.PRNGKey(0))
    ex = {}
    for k, v in obs.items():
        ex[f"obs/{k}"] = v[0]
        ex[f"next_obs/{k}"] = v[0]
    ex["action"] = jnp.zeros(2)
    ex["reward"] = jnp.zeros(())
    ex["done"] = jnp.zeros((), bool)
    ex["log_prob"] = jnp.zeros(())
    replay = replay_create(64, ex)
    pool = jax.tree.map(jnp.copy, scenes)
    pool_idx = jnp.arange(B, dtype=jnp.int32) % B
    reset_queue = jnp.zeros(2 * B, jnp.int32)
    return sac_state, env_state, hybrid, obs, pool_idx, replay, pool, reset_queue


def make_chunk(env, agent, env_cfg):
    return build_sac_chunk(env, agent, env_cfg.step_ratio, chunk_steps=2,
                           updates_per_chunk=2, sgd_batch=8)


def fingerprint(chunk_out):
    """Scalar fingerprints of a chunk result: sum|actor params| and the total
    collected reward — identical across shardings up to fp reduction order."""
    sac_state, logs = chunk_out[0], chunk_out[6]
    a = sum(float(jnp.sum(jnp.abs(leaf)))
            for leaf in jax.tree.leaves(sac_state.actor))
    r = float(jnp.sum(logs["reward"]))
    return a, r
