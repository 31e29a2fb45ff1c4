"""Pallas BEV raster kernel (ops/raster_bev.py) vs the XLA oracles.

Runs in interpreter mode on the CPU test mesh; both parity modes must be
BIT-IDENTICAL to their XLA counterparts (geometry/raster.py) — the kernel's
per-edge culling (drop / straddle-only) and the exact mode's per-polygon
fold are exact simplifications, not approximations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.config import EnvConfig, ObsConfig, VehicleConfig
from hope_tpu.envs.scenario_gen import generate_bank
from hope_tpu.geometry import pose_to_box
from hope_tpu.geometry.raster import render_bev, render_bev_exact
from hope_tpu.ops.raster_bev import render_bev_batch

OBS = ObsConfig()
VCFG = VehicleConfig()
CORNERS = jnp.asarray(VCFG.box_corners(), jnp.float32)


def _batch(seed=0, n=8, level="Complex"):
    scenes, _ = generate_bank(jax.random.PRNGKey(seed), level=level, n=n)
    return scenes


def _poses(scenes, t):
    if t == "start":
        return scenes.start
    if t == "dest":
        return scenes.dest
    a = jax.random.uniform(jax.random.PRNGKey(3), (scenes.start.shape[0], 1),
                           minval=0.3, maxval=0.8)
    return scenes.start * (1 - a) + scenes.dest * a


@pytest.mark.parametrize("mode", ["exact", "global"])
@pytest.mark.parametrize("where", ["start", "mid", "dest"])
def test_kernel_bit_identical_procedural(mode, where):
    scenes = _batch()
    poses = _poses(scenes, where)
    vbox = pose_to_box(poses, CORNERS)
    oracle = render_bev_exact if mode == "exact" else render_bev
    ref = jax.vmap(lambda p, vb, db, e, m, ep: oracle(
        p, vb, db, e, m, ep, OBS, VCFG, 32))(
        poses, vbox, scenes.dest_box, scenes.edges, scenes.edge_mask,
        scenes.edge_poly)
    out = render_bev_batch(poses, vbox, scenes.dest_box, scenes.edges,
                           scenes.edge_mask, scenes.edge_poly, OBS, VCFG,
                           exact=(mode == "exact"), interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_kernel_exact_handles_overlapping_polygons():
    """Hand-built scene with two OVERLAPPING obstacle squares: exact mode must
    keep the intersection filled (the global even-odd mode XORs it out)."""
    def square(cx, cy, r):
        return [[cx - r, cy - r, cx + r, cy - r],
                [cx + r, cy - r, cx + r, cy + r],
                [cx + r, cy + r, cx - r, cy + r],
                [cx - r, cy + r, cx - r, cy - r]]

    edges = jnp.asarray(square(3.0, 0.0, 2.0) + square(4.5, 0.5, 2.0),
                        jnp.float32)
    mask = jnp.ones(8, bool)
    poly = jnp.asarray([0] * 4 + [1] * 4, jnp.int32)
    pose = jnp.asarray([[-3.0, 0.0, 0.0]], jnp.float32)
    vbox = pose_to_box(pose, CORNERS)
    dest_box = pose_to_box(jnp.asarray([[-6.0, 4.0, 0.0]], jnp.float32),
                           CORNERS)

    for mode in (True, False):
        oracle = render_bev_exact if mode else render_bev
        ref = jax.vmap(lambda p, vb, db: oracle(
            p, vb, db, edges, mask, poly, OBS, VCFG, 32))(
            pose, vbox, dest_box)
        out = render_bev_batch(pose, vbox, dest_box, edges[None], mask[None],
                               poly[None], OBS, VCFG, exact=mode,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # sanity: the two modes genuinely differ on this scene (overlap region)
    a = render_bev_batch(pose, vbox, dest_box, edges[None], mask[None],
                         poly[None], OBS, VCFG, exact=True, interpret=True)
    b = render_bev_batch(pose, vbox, dest_box, edges[None], mask[None],
                         poly[None], OBS, VCFG, exact=False, interpret=True)
    assert np.any(np.asarray(a) != np.asarray(b))


def test_kernel_bit_identical_dlp():
    """DLP 512-edge scenes exercise the multi-chunk grid path."""
    from hope_tpu.envs.dlp import DLPDataset
    from hope_tpu.train.scene_pool import pad_scene_batch

    cfg = EnvConfig(obs=ObsConfig(use_img=True), max_edges=512,
                    max_obstacles=128)
    ds = DLPDataset(env_cfg=cfg)
    ids = jnp.asarray([0, 57]) % ds.n_cases
    scenes = ds.batch_reset(jax.random.split(jax.random.PRNGKey(1), 2), ids)
    scenes = pad_scene_batch(scenes, 512, 128)
    for poses in (scenes.start, scenes.dest):
        vbox = pose_to_box(poses, CORNERS)
        ref = jax.vmap(lambda p, vb, db, e, m, ep: render_bev_exact(
            p, vb, db, e, m, ep, OBS, VCFG, 128))(
            poses, vbox, scenes.dest_box, scenes.edges, scenes.edge_mask,
            scenes.edge_poly)
        out = render_bev_batch(poses, vbox, scenes.dest_box, scenes.edges,
                               scenes.edge_mask, scenes.edge_poly, OBS, VCFG,
                               exact=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_env_backend_flag_identical_obs():
    """observe_batch through the forced-pallas backend (interpreted on CPU is
    not wired — compare the building block instead at the env call shapes)
    must match the XLA backend bit-for-bit."""
    from hope_tpu.envs import ParkingEnv

    scenes = _batch(seed=4, n=4, level="Normal")
    env = ParkingEnv(EnvConfig(obs=ObsConfig(use_img=True,
                                             raster_backend="xla"),
                               max_edges=96, max_obstacles=32))
    state, obs = env.batch_reset(scenes)
    pose = state.vehicle.pose
    vbox = pose_to_box(pose, env.corners)
    img = render_bev_batch(pose, vbox, scenes.dest_box, scenes.edges,
                           scenes.edge_mask, scenes.edge_poly,
                           env.cfg.obs, env.cfg.vehicle,
                           interpret=True).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(np.asarray(obs["img"]), np.asarray(img))
