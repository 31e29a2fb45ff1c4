"""Human-rendering helpers produce valid image files."""
import os

import jax
import numpy as np

from hope_tpu.config import EnvConfig, VehicleConfig
from hope_tpu.envs.scenario_gen import generate_case, ScenarioConfig
from hope_tpu.evaluation.render import (
    save_episode_png,
    save_record,
    save_reward_curve,
    save_success_cdf,
)


def test_render_outputs(tmp_path):
    scene, ok = generate_case(jax.random.PRNGKey(0),
                              ScenarioConfig.for_level("Normal"),
                              env_cfg=EnvConfig())
    scene = jax.tree.map(np.asarray, scene)
    poses = np.stack([
        np.linspace(scene.start[0], scene.dest[0], 12),
        np.linspace(scene.start[1], scene.dest[1], 12),
        np.linspace(scene.start[2], scene.dest[2], 12),
    ], axis=-1)
    corners = np.asarray(VehicleConfig().box_corners())

    p1 = tmp_path / "ep.png"
    save_episode_png(str(p1), scene, poses, corners, title="test")
    assert p1.stat().st_size > 1000

    p2 = tmp_path / "cdf.png"
    save_success_cdf(str(p2), np.array([10, 50, 200]), np.array([1, 1, 0]))
    assert p2.stat().st_size > 1000

    p3 = tmp_path / "curve.png"
    save_reward_curve(str(p3), np.sin(np.arange(100) / 5.0))
    assert p3.stat().st_size > 1000

    p4 = tmp_path / "rec.npz"
    save_record(str(p4), {"steps": np.arange(3), "success": np.ones(3, bool)})
    loaded = np.load(str(p4))
    assert loaded["steps"].shape == (3,)


def test_animate_episode_gif(tmp_path):
    scene, ok = generate_case(jax.random.PRNGKey(1),
                              ScenarioConfig.for_level("Normal"),
                              env_cfg=EnvConfig())
    scene = jax.tree.map(np.asarray, scene)
    poses = np.stack([
        np.linspace(scene.start[0], scene.dest[0], 8),
        np.linspace(scene.start[1], scene.dest[1], 8),
        np.linspace(scene.start[2], scene.dest[2], 8),
    ], axis=-1)
    corners = np.asarray(VehicleConfig().box_corners())
    from hope_tpu.evaluation.render import animate_episode

    p = tmp_path / "ep.gif"
    animate_episode(str(p), scene, poses, corners, fps=5)
    assert p.stat().st_size > 5000
