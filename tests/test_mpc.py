"""Pure-MPC runner: RS-exec latching parks a trivially-reachable scene, and
the iLQR-only ablation still produces a valid battery dict."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import EnvConfig, ObsConfig
from hope_tpu.envs import ParkingEnv, make_scene, stack_scenes
from hope_tpu.geometry import pose_to_box
from hope_tpu.planning.ilqr import ILQRConfig
from hope_tpu.planning.mpc import build_mpc_runner


def _env_and_scenes(B=2):
    cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False,
                                  mask_backend="xla"),
                    max_edges=16, max_obstacles=2, rs_max_points=64,
                    rs_max_tries=4)
    env = ParkingEnv(cfg)
    corners = jnp.asarray(cfg.vehicle.box_corners())
    room = np.array([[-12.0, -8], [12, -8], [12, 8], [-12, 8]])
    dest = [4.0, 0.0, 0.0]
    dest_box = np.asarray(pose_to_box(jnp.asarray(dest), corners))
    scene = make_scene([room], [0.0, 0.0, 0.0], dest, [-14, 14, -10, 10],
                       level=0, case_id=1, dest_box=dest_box,
                       max_edges=16, max_polys=2)
    return env, stack_scenes([scene] * B)


def test_mpc_rs_exec_parks_straight_ahead():
    env, scenes = _env_and_scenes()
    dt = env.cfg.vehicle.dt * env.cfg.vehicle.n_substep
    cfg = ILQRConfig(horizon=12, dt=dt, n_iters=3,
                     w_terminal_pos=300.0, w_terminal_heading=80.0,
                     w_running_pos=0.05, w_control=0.05, w_steer_rate=0.2)
    run = build_mpc_runner(env, cfg, replan_every=4, max_steps=24)
    m = jax.tree.map(np.asarray, run(scenes))
    assert m["success"].all(), m["status"]
    assert m["rs_latched"].all()
    assert (m["steps"] < 24).all()


def test_mpc_ilqr_only_runs_and_reports():
    env, scenes = _env_and_scenes()
    dt = env.cfg.vehicle.dt * env.cfg.vehicle.n_substep
    cfg = ILQRConfig(horizon=12, dt=dt, n_iters=3)
    run = build_mpc_runner(env, cfg, replan_every=4, max_steps=16,
                           rs_exec=False)
    m = jax.tree.map(np.asarray, run(scenes))
    for k in ("success", "steps", "path_length", "status", "finished",
              "rs_latched", "level", "case_id"):
        assert k in m, k
    # the refined controls must actually move the car toward the goal
    assert (m["path_length"] > 1.0).all()


def test_staging_open_scene_validates_and_picks():
    from hope_tpu.planning.staging import (
        N_STAGING, compute_staging, pick_goal, staging_candidates)

    env, scenes = _env_and_scenes()
    cands = staging_candidates(jnp.asarray([4.0, 0.0, 0.0]))
    assert cands.shape == (N_STAGING, 3)

    st = compute_staging(env, scenes, max_tries=4)
    # polar candidates first, parallel-parking wiggle templates appended
    assert st.poses.shape[0] == 2 and st.poses.shape[1] >= N_STAGING
    L = np.asarray(st.L)[:, :N_STAGING]
    # open room: many candidates have a valid RS completion
    assert (np.isfinite(L).sum(axis=1) >= 4).all()
    # valid completions are at least as long as the straight-line gap
    d = np.linalg.norm(np.asarray(st.poses)[:, :N_STAGING, :2]
                       - np.asarray(scenes.dest)[:, None, :2], axis=-1)
    ok = np.isfinite(L)
    assert (L[ok] >= d[ok] - 1e-3).all()

    pose = jnp.tile(jnp.asarray([[-6.0, 0.0, 0.0]]), (2, 1))
    goal, has = pick_goal(st, pose, scenes.dest)
    assert bool(jnp.all(has))
    # the chosen goal is a staging pose, not the slot itself (nearest grid
    # radius is 1.0 m)
    assert float(jnp.max(jnp.linalg.norm(goal[:, :2] - scenes.dest[:, :2],
                                         axis=-1))) >= 0.99


def test_staging_blocked_scene_falls_back_to_dest():
    from hope_tpu.planning.staging import compute_staging, pick_goal

    cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False,
                                  mask_backend="xla"),
                    max_edges=16, max_obstacles=2, rs_max_points=64,
                    rs_max_tries=4)
    env = ParkingEnv(cfg)
    corners = jnp.asarray(cfg.vehicle.box_corners())
    # a tight box ring right around the slot: nothing can reach it
    ring = np.array([[2.5, -1.5], [5.5, -1.5], [5.5, 1.5], [2.5, 1.5]])
    dest = [4.0, 0.0, 0.0]
    dest_box = np.asarray(pose_to_box(jnp.asarray(dest), corners))
    scene = make_scene([ring], [-8.0, 0.0, 0.0], dest, [-14, 14, -10, 10],
                       level=0, case_id=1, dest_box=dest_box,
                       max_edges=16, max_polys=2)
    scenes = stack_scenes([scene] * 2)
    st = compute_staging(env, scenes, max_tries=4)
    assert not bool(jnp.any(jnp.isfinite(st.L)))
    pose = jnp.tile(jnp.asarray([[-8.0, 0.0, 0.0]]), (2, 1))
    goal, has = pick_goal(st, pose, scenes.dest)
    assert not bool(jnp.any(has))
    np.testing.assert_allclose(np.asarray(goal), np.asarray(scenes.dest))


def test_mpc_staging_step_rs_parks():
    """Full round-4 configuration: staging target + per-step RS latch."""
    from hope_tpu.planning.staging import compute_staging

    env, scenes = _env_and_scenes()
    dt = env.cfg.vehicle.dt * env.cfg.vehicle.n_substep
    cfg = ILQRConfig(horizon=12, dt=dt, n_iters=3,
                     w_terminal_pos=300.0, w_terminal_heading=80.0,
                     w_running_pos=0.05, w_control=0.05, w_steer_rate=0.2)
    st = compute_staging(env, scenes, max_tries=4)
    run = build_mpc_runner(env, cfg, replan_every=4, max_steps=24,
                           step_rs=True, use_staging=True)
    m = jax.tree.map(np.asarray, run(scenes, st))
    assert m["success"].all(), m["status"]
    assert m["rs_latched"].all()


def test_waypoint_latch_two_segment_plan_reaches_dest():
    """The concatenated [RS(pose->staging), RS(staging->dest)] queue, executed
    verbatim through the env, must land the car on the slot."""
    from functools import partial
    from hope_tpu.agents import HybridState
    from hope_tpu.planning.staging import compute_staging, waypoint_latch

    # rs_max_points=220 -> 22 m sweep budget: the ~12 m first leg must be
    # FULLY sweepable or find_path correctly rejects it (budget rule)
    cfg = EnvConfig(obs=ObsConfig(use_img=False, use_action_mask=False,
                                  mask_backend="xla"),
                    max_edges=16, max_obstacles=2, rs_max_points=220,
                    rs_max_tries=4)
    env = ParkingEnv(cfg)
    _, scenes = _env_and_scenes()
    st = compute_staging(env, scenes, max_tries=4)
    hybrid = HybridState.create(2, 64)
    pose = jnp.tile(jnp.asarray([[-8.0, 4.0, 2.0]]), (2, 1))
    active = jnp.ones(2, bool)
    hybrid, latched = waypoint_latch(env, st, pose, scenes, hybrid, active,
                                     env.cfg.step_ratio)
    assert bool(jnp.all(latched))
    n = int(hybrid.length[0])
    assert n > 0

    # execute the queue open-loop through the real env transition
    state = jax.vmap(env._init_state)(scenes)
    veh = state.vehicle
    veh = veh._replace(x=pose[:, 0], y=pose[:, 1], heading=pose[:, 2])
    state = state.replace(vehicle=veh)
    scale = jnp.asarray([env.cfg.vehicle.max_steer, env.cfg.vehicle.max_speed])

    def step(c, i):
        state = c
        a = hybrid.queue[jnp.arange(2), jnp.minimum(i, hybrid.length - 1)]
        live = i < hybrid.length
        a = a * live[:, None]
        state, r, done, info = jax.vmap(
            partial(env._transition, search_rs=False))(state, a * scale)
        return state, info["status"]

    state, statuses = jax.lax.scan(step, state, jnp.arange(64))
    from hope_tpu.envs.rewards import ARRIVED
    # either the env flagged arrival mid-queue, or the final pose is on the
    # slot within the RS discretization tolerance
    arrived = np.asarray((statuses == ARRIVED).any(axis=0))
    fx = np.asarray(state.vehicle.x)
    fy = np.asarray(state.vehicle.y)
    dest = np.asarray(scenes.dest)
    close = np.hypot(fx - dest[:, 0], fy - dest[:, 1]) < 0.3
    assert (arrived | close).all(), (arrived, fx, fy, dest)


def test_wiggle_templates_close_at_dest():
    """Every parallel-parking template's entry plan, sampled with the shared
    discretizer, ends exactly at the slot-frame origin (the dest pose)."""
    from hope_tpu.config import VehicleConfig
    from hope_tpu.planning import reeds_shepp as rs_mod
    from hope_tpu.planning.parallel_park import build_templates

    maxc = VehicleConfig().max_curvature
    tl, ts, tp = build_templates(maxc)
    assert tl.shape[0] >= 100
    for t in range(0, tl.shape[0], 7):
        poses, mask, _ = rs_mod.sample_path(
            jnp.asarray(tl[t]) * maxc, jnp.asarray(ts[t]), jnp.asarray(tp[t]),
            maxc, 500, 0.05)
        n = int(np.asarray(mask).sum())
        assert np.abs(np.asarray(poses)[n - 1]).max() < 1e-4


def test_wiggle_execution_arrives_on_extrem():
    """On tight parallel (Extrem) scenes, a validated wiggle candidate's
    queue, executed open-loop in the real env from its staging pose, must
    ARRIVE (95% slot overlap) without collision — template validity is a
    swept-check of exactly the executed trajectory."""
    from hope_tpu.envs.rewards import ARRIVED
    from hope_tpu.envs.scenario_gen import generate_bank
    from hope_tpu.planning.rs_select import RSPath, build_action_queue
    from hope_tpu.planning.staging import N_STAGING, compute_staging

    env = ParkingEnv(EnvConfig(obs=ObsConfig(use_img=False,
                                             use_action_mask=False,
                                             mask_backend="xla"),
                               max_edges=96, max_obstacles=32))
    scenes, _ = generate_bank(jax.random.PRNGKey(0), level="Extrem", n=4)
    st = compute_staging(env, scenes, max_tries=4)
    val = np.isfinite(np.asarray(st.L))
    checked = 0
    for b in range(4):
        wi = np.nonzero(val[b, N_STAGING:])[0]
        if not len(wi):
            continue
        s_idx = N_STAGING + int(wi[0])
        scene_b = jax.tree.map(lambda x: x[b], scenes)
        state = env._init_state(scene_b)
        state = state.replace(
            vehicle=state.vehicle.__class__.from_pose(st.poses[b, s_idx]))
        path = RSPath(found=jnp.asarray(True),
                      lengths=st.lengths[b, s_idx],
                      steers=st.steers[b, s_idx], L=st.L[b, s_idx])
        q, n = build_action_queue(path, env.cfg.step_ratio, 64)
        arrived = False
        for i in range(int(n)):
            act = q[i] * jnp.asarray([env.cfg.vehicle.max_steer,
                                      env.cfg.vehicle.max_speed])
            state, r, done, info = env._transition(state, act,
                                                   search_rs=False)
            if int(state.status) == ARRIVED:
                arrived = True
                break
            if bool(done):
                break
        assert arrived, (b, int(state.status))
        checked += 1
    assert checked >= 1
