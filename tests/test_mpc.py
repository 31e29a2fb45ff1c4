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
