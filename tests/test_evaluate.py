"""Evaluation battery: summarize metrics + lockstep episode runner semantics
(reference evaluation/eval_utils.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import EnvConfig, ObsConfig
from hope_tpu.envs import ParkingEnv, make_scene, stack_scenes
from hope_tpu.envs.rewards import ARRIVED
from hope_tpu.evaluation.evaluate import build_episode_runner, summarize
from hope_tpu.geometry import pose_to_box


def test_summarize_per_level_and_steps():
    metrics = {
        "success": np.array([True, False, True, True]),
        "steps": np.array([10, 200, 30, 50]),
        "path_length": np.array([5.0, 80.0, 12.0, 20.0]),
        "level": np.array([0, 0, 1, 1]),
        "case_id": np.arange(4),
        "status": np.array([1, 4, 1, 1]),
        "finished": np.array([True, False, True, True]),
    }
    s = summarize(metrics)
    assert s["success_rate"] == 0.75
    assert s["n"] == 4
    assert s["per_level"]["Normal"]["success_rate"] == 0.5
    assert s["per_level"]["Complex"]["success_rate"] == 1.0
    # path length averaged only over completed-within-cap episodes
    assert s["per_level"]["Normal"]["path_length_mean"] == 5.0
    # success_steps over successes only
    np.testing.assert_allclose(s["success_steps_mean"], np.mean([10, 30, 50]))


def test_summarize_respects_max_steps_cap():
    # with a 100-step cap the 200-step episode is still over-cap, but the
    # 50-step one remains under; with a 40-step cap it drops out too
    metrics = {
        "success": np.array([True, False]),
        "steps": np.array([50, 200]),
        "path_length": np.array([20.0, 80.0]),
        "level": np.array([0, 0]),
        "case_id": np.arange(2),
        "status": np.array([1, 4]),
        "finished": np.array([True, False]),
    }
    s100 = summarize(metrics, max_steps=100)
    assert s100["per_level"]["Normal"]["path_length_mean"] == 20.0
    s40 = summarize(metrics, max_steps=40)
    assert s40["per_level"]["Normal"]["path_length_mean"] is None


def _tiny_env_and_scenes(B=2):
    cfg = EnvConfig(obs=ObsConfig(use_img=False, mask_backend="xla"),
                    max_edges=16, max_obstacles=2, rs_max_points=32,
                    rs_max_tries=2)
    env = ParkingEnv(cfg)
    corners = jnp.asarray(cfg.vehicle.box_corners())
    room = np.array([[-12.0, -8], [12, -8], [12, 8], [-12, 8]])
    dest = [4.0, 0.0, 0.0]
    dest_box = np.asarray(pose_to_box(jnp.asarray(dest), corners))
    scene = make_scene([room], [0.0, 0.0, 0.0], dest, [-14, 14, -10, 10],
                       level=0, case_id=7, dest_box=dest_box,
                       max_edges=16, max_polys=2)
    return env, stack_scenes([scene] * B)


def test_episode_runner_forward_policy_arrives():
    env, scenes = _tiny_env_and_scenes()

    # drive straight ahead at full speed: dest is 4 m in front, RS latch or the
    # raw motion finishes the episode well inside the cap
    def policy_act(obs, k):
        B = obs["target"].shape[0]
        return jnp.tile(jnp.asarray([[0.0, 1.0]]), (B, 1)), jnp.zeros(B)

    def policy_logp(obs, a):
        return jnp.zeros(a.shape[0])

    run = build_episode_runner(env, policy_act, policy_logp, max_steps=24,
                               use_rs=True)
    m = jax.tree.map(np.asarray, run(scenes, jax.random.PRNGKey(0)))
    assert m["success"].all()
    assert (m["status"] == ARRIVED).all()
    assert (m["steps"] < 24).all()
    assert (m["path_length"] > 2.0).all()  # integrated motion, not zero
    assert (m["case_id"] == 7).all()


def test_episode_runner_policy_actually_steers():
    """Two different constant policies must produce different trajectories —
    regression for the stuck-detector carrying the post-step target, which
    compared the obs with itself and replaced EVERY action with a random one
    (all round-2 eval batteries reported random-policy numbers)."""
    env, scenes = _tiny_env_and_scenes()

    def const(a):
        def pa(obs, k):
            B = obs["target"].shape[0]
            return jnp.tile(jnp.asarray([a]), (B, 1)), jnp.zeros(B)
        return pa

    pl = lambda obs, a: jnp.zeros(a.shape[0])  # noqa: E731
    run_f = build_episode_runner(env, const([0.0, 1.0]), pl, max_steps=12,
                                 use_rs=False)
    run_b = build_episode_runner(env, const([0.4, -1.0]), pl, max_steps=12,
                                 use_rs=False)
    mf = jax.tree.map(np.asarray, run_f(scenes, jax.random.PRNGKey(0)))
    mb = jax.tree.map(np.asarray, run_b(scenes, jax.random.PRNGKey(0)))
    assert not np.allclose(mf["path_length"], mb["path_length"])


def test_episode_runner_stuck_detector_fires_when_frozen():
    """A zero action never moves the car -> identical targets -> the stuck
    detector's random actions produce nonzero motion (reference
    eval_utils.py:46-48)."""
    env, scenes = _tiny_env_and_scenes()

    def pa(obs, k):
        B = obs["target"].shape[0]
        return jnp.zeros((B, 2)), jnp.zeros(B)

    pl = lambda obs, a: jnp.zeros(a.shape[0])  # noqa: E731
    run = build_episode_runner(env, pa, pl, max_steps=20, use_rs=False)
    m = jax.tree.map(np.asarray, run(scenes, jax.random.PRNGKey(3)))
    assert (m["path_length"] > 0.05).all()


def test_episode_runner_freezes_after_done():
    env, scenes = _tiny_env_and_scenes()

    def policy_act(obs, k):
        B = obs["target"].shape[0]
        return jnp.tile(jnp.asarray([[0.0, 1.0]]), (B, 1)), jnp.zeros(B)

    def policy_logp(obs, a):
        return jnp.zeros(a.shape[0])

    short = build_episode_runner(env, policy_act, policy_logp, max_steps=24)
    longer = build_episode_runner(env, policy_act, policy_logp, max_steps=40)
    m1 = jax.tree.map(np.asarray, short(scenes, jax.random.PRNGKey(0)))
    m2 = jax.tree.map(np.asarray, longer(scenes, jax.random.PRNGKey(0)))
    # extending the battery after everyone finished changes nothing
    np.testing.assert_array_equal(m1["steps"], m2["steps"])
    np.testing.assert_allclose(m1["path_length"], m2["path_length"], rtol=1e-6)


def test_eval_mix_scene_cli_smoke(tmp_path):
    """The eval CLI end-to-end on a tiny random-agent battery: per-level
    reports + records + CDF plots land on disk."""
    import json
    import os

    from hope_tpu.evaluation.eval_mix_scene import main

    out = str(tmp_path / "eval")
    results = main(["random", "--no-img", "--no-dlp", "--episodes", "4",
                    "--max-steps", "6", "--out", out])
    assert set(results) == {"Extrem", "Complex", "Normal"}
    for lvl in results:
        assert os.path.exists(os.path.join(out, f"result_{lvl}.json"))
        assert os.path.exists(os.path.join(out, f"record_{lvl}.npz"))
        r = json.load(open(os.path.join(out, f"result_{lvl}.json")))
        assert 0.0 <= r["success_rate"] <= 1.0
    assert os.path.exists(os.path.join(out, "result_all.json"))
