"""Sharding: the batched env + SAC update run over an 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_batch_matches_single_device(rng):
    """A jitted computation over a dp-sharded batch equals the unsharded one."""
    mesh = make_mesh()
    x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))

    f = jax.jit(lambda x, w: jnp.tanh(x @ w).sum(axis=-1))
    plain = f(x, w)
    xs = shard_batch(x, mesh)
    ws = replicate(w, mesh)
    sharded = f(xs, ws)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), atol=1e-6)
    # result really is sharded over dp
    assert sharded.sharding.is_equivalent_to(batch_sharding(mesh), ndim=1)


def test_train_sac_cli_devices_8(tmp_path):
    """The real trainer CLI trains with --devices 8 on the virtual CPU mesh
    (the dp mesh is reachable from user code, not only from the dry run)."""
    from hope_tpu.train.train_sac import main

    main(["--smoke", "--devices", "8", "--log-dir", str(tmp_path / "dp8"),
          "--no-tensorboard"])
    # the exit save is the full-fidelity loop checkpoint (round 4)
    assert (tmp_path / "dp8" / "ckpt_full").exists()


def test_sac_chunk_sharded_matches_single_device():
    """One full SAC training chunk (collect + resets + SGD) produces the same
    numbers whether its inputs are dp-sharded over the 8-device mesh or live
    on one device — GSPMD only changes the partitioning, not the math."""
    import numpy as np

    from hope_tpu.agents import HybridState, SACAgent, replay_create
    from hope_tpu.config import (EnvConfig, ObsConfig, SACConfig,
                                 actor_net_config, critic_net_config)
    from hope_tpu.envs import ParkingEnv, make_scene, stack_scenes
    from hope_tpu.geometry import pose_to_box
    from hope_tpu.train.chunked import build_sac_chunk

    obs_cfg = ObsConfig(use_img=False, mask_backend="xla")
    env_cfg = EnvConfig(obs=obs_cfg, max_edges=32, max_obstacles=4,
                        rs_max_points=64, rs_max_tries=2)
    env = ParkingEnv(env_cfg)
    agent = SACAgent(actor_net_config(obs_cfg),
                     critic_net_config(obs_cfg, action_input=True),
                     SACConfig(), env.observation_shape, env.mask_table)

    B = 16
    corners = jnp.asarray(env_cfg.vehicle.box_corners())
    room = np.array([[-8.0, -8], [8, -8], [8, 8], [-8, 8]])
    dest = [3.0, 0.0, 0.0]
    dest_box = np.asarray(pose_to_box(jnp.asarray(dest), corners))
    scene = make_scene([room], [0.0, 0.0, 0.0], dest, [-10, 10, -10, 10], 0, 0,
                       dest_box, max_edges=32, max_polys=4)

    def build_inputs():
        # fresh buffers per variant: the chunk donates env_state/pool-adjacent
        # arrays, which would invalidate shared scene buffers across variants
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
        # real copy: env_state aliases the scene buffers and is donated, so the
        # (non-donated) pool must not share them
        pool = jax.tree.map(jnp.copy, scenes)
        pool_idx = jnp.arange(B, dtype=jnp.int32) % B
        reset_queue = jnp.zeros(2 * B, jnp.int32)
        return sac_state, env_state, hybrid, obs, pool_idx, replay, pool, reset_queue

    # chunk donates its buffers, so build fresh inputs per variant
    chunk = build_sac_chunk(env, agent, env_cfg.step_ratio, chunk_steps=2,
                            updates_per_chunk=2, sgd_batch=8)
    args_plain = build_inputs()
    out_plain = chunk(*args_plain, jax.random.PRNGKey(1), warmup=False)

    mesh = make_mesh()
    (sac_state, env_state, hybrid, obs, pool_idx, replay, pool,
     reset_queue) = build_inputs()
    args_shard = (
        replicate(sac_state, mesh), shard_batch(env_state, mesh),
        shard_batch(hybrid, mesh), shard_batch(obs, mesh),
        shard_batch(pool_idx, mesh),
        replay.replace(data=shard_batch(replay.data, mesh)),
        replicate(pool, mesh), replicate(reset_queue, mesh),
    )
    out_shard = chunk(*args_shard, jax.random.PRNGKey(1), warmup=False)

    # same logs, same final params (fp32 reduction-order tolerance)
    np.testing.assert_array_equal(np.asarray(out_plain[6]["done"]),
                                  np.asarray(out_shard[6]["done"]))
    np.testing.assert_allclose(np.asarray(out_plain[6]["reward"]),
                               np.asarray(out_shard[6]["reward"]),
                               rtol=1e-5, atol=1e-6)
    for leaf_a, leaf_b in zip(jax.tree.leaves(out_plain[0].actor),
                              jax.tree.leaves(out_shard[0].actor)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   rtol=2e-4, atol=1e-6)
