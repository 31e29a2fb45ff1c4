"""Batched iLQR: convergence, obstacle avoidance, batching."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import VehicleConfig
from hope_tpu.planning.ilqr import ILQRConfig, solve, solve_batch

VCFG = VehicleConfig()


def test_open_space_reaches_goal():
    cfg = ILQRConfig(horizon=30, n_iters=15)
    x0 = jnp.asarray([0.0, 0.0, 0.0])
    goal = jnp.asarray([6.0, 2.0, 0.0])
    edges = jnp.zeros((4, 4))
    mask = jnp.zeros(4, bool)
    us0 = jnp.tile(jnp.asarray([0.0, 1.0]), (cfg.horizon, 1))
    res = solve(x0, goal, edges, mask, us0, cfg, VCFG)
    end = np.asarray(res.xs[-1])
    assert np.hypot(end[0] - 6.0, end[1] - 2.0) < 0.3, end
    assert bool(res.converged)


def test_obstacle_pushes_trajectory_away():
    cfg = ILQRConfig(horizon=30, n_iters=15)
    x0 = jnp.asarray([0.0, 0.0, 0.0])
    goal = jnp.asarray([8.0, 0.0, 0.0])
    # wall segment crossing the straight line at x=4 (y in [-1.2, 0.3]); the
    # warm start carries a slight arc, as a real RS warm start would — a
    # perfectly symmetric straight line sits on a zero-gradient saddle
    edges = jnp.asarray([[4.0, -1.2, 4.0, 0.3]] + [[0.0] * 4] * 3)
    mask = jnp.asarray([True, False, False, False])
    us0 = jnp.tile(jnp.asarray([0.06, 1.2]), (cfg.horizon, 1))
    res = solve(x0, goal, edges, mask, us0, cfg, VCFG)
    xs = np.asarray(res.xs)
    near = np.abs(xs[:, 0] - 4.0) < 0.8
    assert near.any()
    assert np.abs(xs[near, 1]).max() > 0.8, "trajectory did not deviate around wall"
    end = xs[-1]
    assert np.hypot(end[0] - 8.0, end[1]) < 0.6


def test_batched_solve():
    cfg = ILQRConfig(horizon=20, n_iters=8)
    B = 4
    x0 = jnp.zeros((B, 3))
    goal = jnp.stack([jnp.full(B, 5.0), jnp.linspace(-1, 1, B), jnp.zeros(B)], -1)
    edges = jnp.zeros((B, 4, 4))
    mask = jnp.zeros((B, 4), bool)
    us0 = jnp.tile(jnp.asarray([0.0, 1.0]), (B, cfg.horizon, 1))
    res = solve_batch(x0, goal, edges, mask, us0, cfg, VCFG)
    ends = np.asarray(res.xs[:, -1])
    err = np.hypot(ends[:, 0] - np.asarray(goal[:, 0]), ends[:, 1] - np.asarray(goal[:, 1]))
    assert (err < 0.5).all(), err
