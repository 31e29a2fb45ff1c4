"""BEV rasterizer: the ego-frame separable formulation must reproduce the
world-frame oracle (crossing parity is ray-direction independent) up to
boundary pixels, and basic content invariants must hold."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.config import EnvConfig, ObsConfig, VehicleConfig
from hope_tpu.envs.scenario_gen import ScenarioConfig, generate_case
from hope_tpu.geometry import pose_to_box
from hope_tpu.geometry.raster import render_bev, render_bev_oracle

OBS = ObsConfig()
VCFG = VehicleConfig()


def _scene(seed, level="Complex"):
    scene, ok = generate_case(jax.random.PRNGKey(seed),
                              ScenarioConfig.for_level(level),
                              env_cfg=EnvConfig())
    assert bool(ok)
    return scene


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ego_matches_world_oracle(seed):
    scene = _scene(seed)
    corners = jnp.asarray(VCFG.box_corners())
    for t, pose in enumerate([scene.start,
                              (scene.start + scene.dest) / 2.0,
                              scene.dest]):
        vb = pose_to_box(pose, corners)
        new = np.asarray(render_bev(pose, vb, scene.dest_box, scene.edges,
                                    scene.edge_mask, scene.edge_poly,
                                    OBS, VCFG))
        ref = np.asarray(render_bev_oracle(pose, vb, scene.dest_box,
                                           scene.edges, scene.edge_mask,
                                           scene.edge_poly, OBS, VCFG))
        # identical up to boundary pixels (different fp ray): allow <0.5%
        frac = np.mean(np.any(new != ref, axis=-1))
        assert frac < 0.005, (seed, t, frac)


def test_bev_content_invariants():
    scene = _scene(5, "Normal")
    corners = jnp.asarray(VCFG.box_corners())
    pose = scene.start
    vb = pose_to_box(pose, corners)
    img = np.asarray(render_bev(pose, vb, scene.dest_box, scene.edges,
                                scene.edge_mask, scene.edge_poly, OBS, VCFG))
    # the car (blue) always covers the image center
    n = OBS.img_size
    center = img[n // 2, n // 2]
    np.testing.assert_allclose(center, [30 / 255, 144 / 255, 255 / 255],
                               atol=1e-6)
    # car pixel count ~ car area / pixel area (within a loose band)
    car_px = np.all(np.isclose(img, np.asarray([30, 144, 255]) / 255.0),
                    axis=-1).sum()
    area = (VCFG.front_hang + VCFG.wheel_base + VCFG.rear_hang) * VCFG.width
    expect = area / (OBS.img_res ** 2)
    assert 0.7 * expect < car_px < 1.3 * expect


def test_bev_empty_scene_is_background_plus_car_dest():
    corners = jnp.asarray(VCFG.box_corners())
    pose = jnp.asarray([0.0, 0.0, 0.3])
    vb = pose_to_box(pose, corners)
    dest_box = np.asarray(pose_to_box(jnp.asarray([3.0, 1.0, 0.3]), corners))
    img = np.asarray(render_bev(pose, vb, dest_box,
                                jnp.zeros((8, 4)), jnp.zeros(8, bool),
                                jnp.zeros(8, jnp.int32), OBS, VCFG))
    grey = np.all(np.isclose(img, 150 / 255.0), axis=-1)
    assert not grey.any()      # padded edges never rasterize
    assert (img == 0).all(axis=-1).mean() > 0.5   # mostly background
