"""Environment layer: lidar, action mask, step semantics, scenario gen, DLP."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.config import ActionMaskConfig, EnvConfig, LidarConfig, ScenarioConfig, VehicleConfig
from hope_tpu.envs import (
    ARRIVED,
    CONTINUE,
    OUTTIME,
    ParkingEnv,
    Scene,
    build_table,
    choose_action,
    discrete_actions,
    get_steps,
    lidar_observation,
    make_scene,
    stack_scenes,
    vehicle_boundary,
    beam_angles,
)
from hope_tpu.envs.scenario_gen import generate_bank, generate_case

from . import oracle

VCFG = VehicleConfig()


def _square_scene(half=8.0):
    """A square room around the origin, slot 2 m ahead."""
    room = np.array([[-half, -half], [half, -half], [half, half], [-half, half]])
    start = [0.0, 0.0, 0.0]
    dest = [3.0, 0.0, 0.0]
    from hope_tpu.geometry import pose_to_box

    dest_box = np.asarray(pose_to_box(jnp.asarray(dest), jnp.asarray(VCFG.box_corners())))
    return make_scene([room], start, dest, [-10, 10, -10, 10], 0, 0, dest_box,
                      max_edges=64, max_polys=8)


# ------------------------------------------------------------------- lidar

def test_lidar_square_room_vs_oracle(rng):
    cfg = LidarConfig()
    scene = _square_scene()
    angles = beam_angles(cfg)
    base = vehicle_boundary(cfg, VCFG)
    pose = jnp.asarray([1.0, 0.5, 0.4])
    got = np.asarray(lidar_observation(pose, scene.edges, scene.edge_mask, angles, base, cfg))
    # oracle: transform edges into ego frame, raycast
    edges = np.asarray(scene.edges[np.asarray(scene.edge_mask)])
    c, s = math.cos(0.4), math.sin(0.4)
    for i in range(0, cfg.n_beams, 7):
        a = 2 * math.pi * i / cfg.n_beams
        best = math.inf
        for e in edges:
            p1 = ((e[0] - 1.0) * c + (e[1] - 0.5) * s, -(e[0] - 1.0) * s + (e[1] - 0.5) * c)
            p2 = ((e[2] - 1.0) * c + (e[3] - 0.5) * s, -(e[2] - 1.0) * s + (e[3] - 0.5) * c)
            best = min(best, oracle.ray_segment_distance(a, p1, p2))
        want = min(best, cfg.max_range) - float(np.asarray(base)[i])
        np.testing.assert_allclose(got[i], want, atol=1e-4, err_msg=f"beam {i}")


def test_vehicle_boundary_sane():
    base = np.asarray(vehicle_boundary(LidarConfig(), VCFG))
    # forward beam exits through the front bumper
    np.testing.assert_allclose(base[0], VCFG.front_hang + VCFG.wheel_base, rtol=1e-5)
    # all beams exit within the box circumradius
    assert (base > 0.5).all() and (base < 4.0).all()


# ------------------------------------------------------------- action mask

def test_discrete_actions_layout():
    acts = discrete_actions(ActionMaskConfig(), VCFG)
    assert acts.shape == (42, 2)
    np.testing.assert_allclose(acts[0], [0.75, 1.0], atol=1e-6)
    np.testing.assert_allclose(acts[20], [-0.75, 1.0], atol=1e-6)
    np.testing.assert_allclose(acts[21], [0.75, -1.0], atol=1e-6)
    # steer sweep is uniform with step 0.075
    np.testing.assert_allclose(np.diff(acts[:21, 0]), -0.075, atol=1e-6)


def test_action_mask_open_vs_blocked():
    table = build_table()
    cfg = ActionMaskConfig()
    # open space: every action fully safe -> mask == 1 except eroded extremes
    open_lidar = jnp.full(120, 10.0)
    m_open = np.asarray(get_steps(open_lidar, table, cfg))
    assert m_open.max() == 1.0
    assert (m_open >= 0).all() and m_open.shape == (42,)
    # wall dead ahead at 0.3 m: forward actions blocked, reverse mostly free
    ahead = jnp.where((jnp.arange(120) < 15) | (jnp.arange(120) >= 105), 0.3, 10.0)
    m_wall = np.asarray(get_steps(ahead, table, cfg))
    # mask horizon moves 0.05 m/substep; a 0.3 m gap allows ~5 of 10 substeps
    # for straight-forward, while straight-reverse stays fully free; steered
    # reverse is also limited (the front corner swings into the wall)
    assert m_wall[10] <= 0.6          # straight forward limited
    assert m_wall[31] == 1.0          # straight reverse free
    assert m_wall[10] < m_wall[31]


def test_choose_action_respects_mask():
    table = build_table()
    cfg = ActionMaskConfig()
    mask = jnp.zeros(42).at[5].set(1.0)
    key = jax.random.PRNGKey(0)
    act, idx = choose_action(key, jnp.zeros(2), jnp.ones(2), mask, table)
    assert int(idx) == 5
    np.testing.assert_allclose(np.asarray(act), np.asarray(table.actions_norm[5]))


# ------------------------------------------------------------------- env

def test_env_reset_and_step_continue():
    env = ParkingEnv(EnvConfig(max_edges=64, max_obstacles=8))
    scene = _square_scene()
    state, obs = env.reset(scene)
    assert int(state.t) == 1
    assert obs["target"].shape == (5,)
    assert obs["lidar"].shape == (120,)
    assert obs["action_mask"].shape == (42,)
    assert obs["img"].shape == (3, 64, 64)
    # drive forward gently: should continue and earn dist reward
    state2, obs2, r, done, info = env.step(state, jnp.asarray([0.0, 1.0]), search_rs=False)
    assert int(state2.status) == CONTINUE
    assert not bool(done)
    assert float(state2.vehicle.x) > 0.4
    terms = np.asarray(info["reward_terms"])
    assert terms[2] > 0  # dist reward positive, approaching dest


def test_env_collision_freezes_not_kills():
    """ENV_COLLIDE=False semantics: driving into a wall freezes at the wall,
    status stays CONTINUE (reference car_parking_base.py:259-271 + configs ENV_COLLIDE)."""
    env = ParkingEnv(EnvConfig(max_edges=64, max_obstacles=8))
    scene = _square_scene(half=2.0)
    state, _ = env.reset(scene)
    for _ in range(8):
        state, _, _, done, info = env.step(state, jnp.asarray([0.0, 2.5]), search_rs=False)
    # wall at x=2: vehicle nose (3.76 m ahead of axle) must stop before it
    assert float(state.vehicle.x) < 2.0
    assert int(state.status) == CONTINUE
    assert not bool(done)


def test_env_arrival():
    env = ParkingEnv(EnvConfig(max_edges=64, max_obstacles=8))
    scene = _square_scene()
    state, _ = env.reset(scene)
    # drive straight onto the slot 3 m ahead
    done = False
    for _ in range(10):
        state, _, r, done, info = env.step(state, jnp.asarray([0.0, 1.0]), search_rs=False)
        if bool(done):
            break
    assert int(state.status) == ARRIVED
    np.testing.assert_allclose(float(r), 5.0)  # +50 * 0.1


def test_env_timeout():
    env = ParkingEnv(EnvConfig(max_edges=64, max_obstacles=8, tolerant_time=3))
    scene = _square_scene()
    state, _ = env.reset(scene)
    for _ in range(4):
        state, _, r, done, _ = env.step(state, jnp.asarray([0.0, 0.0]), search_rs=False)
    assert int(state.status) == OUTTIME
    np.testing.assert_allclose(float(r), -0.1)


def test_env_batch_and_rs_info():
    env = ParkingEnv(EnvConfig(max_edges=64, max_obstacles=8))
    # both rooms must leave space for the car nose at the dest (3 + 3.76 < half)
    scenes = stack_scenes([_square_scene(), _square_scene(7.5)])
    state, obs = env.batch_reset(scenes)
    assert obs["lidar"].shape == (2, 120)
    acts = jnp.tile(jnp.asarray([0.0, 1.0]), (2, 1))
    state, obs, r, done, info = env.batch_step(state, acts)
    assert r.shape == (2,)
    # both envs are < 10 m from dest with a clear straight path -> RS found
    assert bool(jnp.all(info["rs"].found))
    assert info["rs"].lengths.shape == (2, 5)


# --------------------------------------------------------------- scenarios

@pytest.mark.parametrize("level", ["Normal", "Complex", "Extrem"])
def test_generate_bank(level):
    key = jax.random.PRNGKey(3)
    scenes, ok = generate_bank(key, level=level, n=16)
    ok = np.asarray(ok)
    assert ok.mean() > 0.5, f"{level}: only {ok.mean():.0%} generations succeeded"
    # check a feasible one: start box collision-free, dest inside bounds
    from hope_tpu.geometry import pose_to_box, box_to_edges, segments_intersect

    corners = jnp.asarray(VCFG.box_corners())
    i = int(np.argmax(ok))
    sc = jax.tree.map(lambda x: x[i], scenes)
    sbox = pose_to_box(sc.start, corners)
    hits = segments_intersect(box_to_edges(sbox), sc.edges) & sc.edge_mask[None, :]
    assert not bool(jnp.any(hits)), "start pose collides"
    b = np.asarray(sc.bounds)
    assert b[0] <= float(sc.dest[0]) <= b[1] and b[2] <= float(sc.dest[1]) <= b[3]


def test_generated_slot_gap_matches_level():
    """The slot gap between critical obstacles respects the level's lot dicts."""
    cfg = ScenarioConfig.for_level("Normal")
    key = jax.random.PRNGKey(11)
    scene, ok = generate_case(key, cfg, bay=True)
    assert bool(ok)


# ------------------------------------------------------------------- DLP

@pytest.mark.skipif(not os.path.exists(
    os.path.join(os.path.dirname(__file__), "..", "data", "dlp.npz")),
    reason="dlp.npz not exported")
def test_dlp_reset():
    from hope_tpu.envs.dlp import DLPDataset

    ds = DLPDataset()
    assert ds.n_cases == 248
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    ids = jnp.arange(4)
    scenes = ds.batch_reset(keys, ids)
    assert scenes.edges.shape == (4, 512, 4)
    b = np.asarray(scenes.bounds)
    s = np.asarray(scenes.start)
    assert ((s[:, 0] >= b[:, 0]) & (s[:, 0] <= b[:, 1])).all()
    # live edges stay within ~bounds window (filter worked)
    for i in range(4):
        e = np.asarray(scenes.edges[i])[np.asarray(scenes.edge_mask[i])]
        assert len(e) > 0
    # env steps on a DLP scene
    env = ParkingEnv(ds.env_cfg)
    state, obs = env.batch_reset(scenes)
    state, obs, r, done, info = env.batch_step(
        state, jnp.tile(jnp.asarray([0.0, 0.5]), (4, 1)), search_rs=False)
    assert np.isfinite(np.asarray(r)).all()
