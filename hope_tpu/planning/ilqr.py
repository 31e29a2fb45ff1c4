"""Batched iLQR trajectory refinement for the kinematic bicycle.

New capability beyond the reference (required by BASELINE.json): a pure-MPC /
refinement mode in which RS or policy trajectories are polished by an iterative
LQR solve.  Per scenario, dynamics are the exact closed-form arc step,
linearization is ``jax.jacfwd``, the Riccati backward pass is a ``lax.scan``,
and the forward pass line-searches over a fixed alpha schedule — all vmapped so
thousands of scenario solves run in lockstep per device, with gradients/QP
blocks reduced over the mesh by the caller when sharded.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import VehicleConfig
from ..geometry import point_segment_distance


class ILQRConfig(NamedTuple):
    horizon: int = 40
    dt: float = 0.25                  # control interval (s)
    n_iters: int = 12
    w_terminal_pos: float = 60.0
    w_terminal_heading: float = 20.0
    w_running_pos: float = 0.4
    w_control: float = 0.6
    w_steer_rate: float = 0.4
    w_obstacle: float = 30.0
    obstacle_margin: float = 0.35     # clearance target (m)
    reg_init: float = 1.0
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)


def _dynamics(x, u, vcfg: VehicleConfig, dt: float):
    """Exact constant-control arc step of the bicycle (closed form)."""
    steer = jnp.clip(u[0], -vcfg.max_steer, vcfg.max_steer)
    v = jnp.clip(u[1], -vcfg.max_speed, vcfg.max_speed)
    curv = jnp.tan(steer) / vcfg.wheel_base
    dth = v * curv * dt
    th = x[2]
    small = jnp.abs(dth) < 1e-9
    r = jnp.where(small, 1.0, v * dt / jnp.where(small, 1.0, dth))
    dx = jnp.where(small, v * dt * jnp.cos(th), r * (jnp.sin(th + dth) - jnp.sin(th)))
    dy = jnp.where(small, v * dt * jnp.sin(th), -r * (jnp.cos(th + dth) - jnp.cos(th)))
    return jnp.stack([x[0] + dx, x[1] + dy, th + dth])


def _body_discs(x, vcfg: VehicleConfig):
    """3 covering-disc centres along the car body (collision proxy)."""
    th = x[2]
    c, s = jnp.cos(th), jnp.sin(th)
    offsets = jnp.asarray([0.0,
                           (vcfg.front_hang + vcfg.wheel_base) * 0.5,
                           vcfg.front_hang + vcfg.wheel_base - 0.4])
    px = x[0] + c * offsets
    py = x[1] + s * offsets
    return jnp.stack([px, py], axis=-1)              # (3, 2)


def _disc_radius(vcfg: VehicleConfig):
    return vcfg.width / 2.0 + 0.05


def make_costs(goal, edges, edge_mask, cfg: ILQRConfig, vcfg: VehicleConfig):
    radius = _disc_radius(vcfg)

    def obstacle_cost(x):
        discs = _body_discs(x, vcfg)
        d = point_segment_distance(discs, edges)      # (3, E)
        d = jnp.where(edge_mask[None, :], d, jnp.inf)
        clearance = jnp.min(d, axis=-1) - radius
        viol = jnp.maximum(cfg.obstacle_margin - clearance, 0.0)
        return cfg.w_obstacle * jnp.sum(viol**2)

    def stage_cost(x, u, u_prev):
        pos = cfg.w_running_pos * jnp.sum((x[:2] - goal[:2]) ** 2)
        ctrl = cfg.w_control * jnp.sum(u**2)
        rate = cfg.w_steer_rate * (u[0] - u_prev[0]) ** 2
        return pos + ctrl + rate + obstacle_cost(x)

    def terminal_cost(x):
        pos = cfg.w_terminal_pos * jnp.sum((x[:2] - goal[:2]) ** 2)
        hd = cfg.w_terminal_heading * (1.0 - jnp.cos(x[2] - goal[2]))
        return pos + hd + obstacle_cost(x)

    return stage_cost, terminal_cost


class ILQRResult(NamedTuple):
    xs: jnp.ndarray       # (N+1, 3)
    us: jnp.ndarray       # (N, 2)
    cost: jnp.ndarray     # ()
    converged: jnp.ndarray


def solve(x0, goal, edges, edge_mask, us_init,
          cfg: ILQRConfig = ILQRConfig(),
          vcfg: VehicleConfig = VehicleConfig()) -> ILQRResult:
    """Single-scenario iLQR solve (vmap for batches).

    Args:
      x0: (3,) initial pose.  goal: (3,) target pose.
      edges: (E, 4) obstacle segments + (E,) mask.
      us_init: (N, 2) warm-start controls (e.g. an RS path's [steer, v] plan).
    """
    dyn = lambda x, u: _dynamics(x, u, vcfg, cfg.dt)  # noqa: E731
    stage, terminal = make_costs(goal, edges, edge_mask, cfg, vcfg)

    def rollout(us):
        def f(x, u):
            nx = dyn(x, u)
            return nx, nx

        _, xs_tail = jax.lax.scan(f, x0, us)
        return jnp.concatenate([x0[None], xs_tail])

    def total_cost(xs, us):
        u_prev = jnp.concatenate([us[:1], us[:-1]])
        stages = jax.vmap(stage)(xs[:-1], us, u_prev)
        return jnp.sum(stages) + terminal(xs[-1])

    fx_fn = jax.jacfwd(dyn, argnums=0)
    fu_fn = jax.jacfwd(dyn, argnums=1)

    def quadraticize(xs, us):
        u_prev = jnp.concatenate([us[:1], us[:-1]])
        lx = jax.vmap(jax.grad(stage, argnums=0))(xs[:-1], us, u_prev)
        lu = jax.vmap(jax.grad(stage, argnums=1))(xs[:-1], us, u_prev)
        lxx = jax.vmap(jax.hessian(stage, argnums=0))(xs[:-1], us, u_prev)
        luu = jax.vmap(jax.hessian(stage, argnums=1))(xs[:-1], us, u_prev)
        fx = jax.vmap(fx_fn)(xs[:-1], us)
        fu = jax.vmap(fu_fn)(xs[:-1], us)
        return lx, lu, lxx, luu, fx, fu

    def backward(xs, us, reg):
        lx, lu, lxx, luu, fx, fu = quadraticize(xs, us)
        Vx = jax.grad(terminal)(xs[-1])
        Vxx = jax.hessian(terminal)(xs[-1])

        def bstep(carry, inp):
            Vx, Vxx = carry
            lx_t, lu_t, lxx_t, luu_t, fx_t, fu_t = inp
            Qx = lx_t + fx_t.T @ Vx
            Qu = lu_t + fu_t.T @ Vx
            Qxx = lxx_t + fx_t.T @ Vxx @ fx_t
            Quu = luu_t + fu_t.T @ Vxx @ fu_t + reg * jnp.eye(2)
            Qux = fu_t.T @ Vxx @ fx_t
            Quu_inv = jnp.linalg.inv(Quu)
            k = -Quu_inv @ Qu
            K = -Quu_inv @ Qux
            Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            return (Vx_new, Vxx_new), (k, K)

        (_, _), (ks, Ks) = jax.lax.scan(
            bstep, (Vx, Vxx), (lx, lu, lxx, luu, fx, fu), reverse=True)
        return ks, Ks

    def forward(xs, us, ks, Ks, alpha):
        def fstep(x, inp):
            x_ref, u_ref, k, K = inp
            u = u_ref + alpha * k + K @ (x - x_ref)
            u = jnp.stack([jnp.clip(u[0], -vcfg.max_steer, vcfg.max_steer),
                           jnp.clip(u[1], -vcfg.max_speed, vcfg.max_speed)])
            nx = dyn(x, u)
            return nx, (nx, u)

        _, (xs_tail, us_new) = jax.lax.scan(fstep, xs[0], (xs[:-1], us, ks, Ks))
        xs_new = jnp.concatenate([xs[:1], xs_tail])
        return xs_new, us_new

    def iteration(carry, _):
        xs, us, cost, reg = carry
        ks, Ks = backward(xs, us, reg)

        def try_alpha(best, alpha):
            xs_a, us_a = forward(xs, us, ks, Ks, alpha)
            c_a = total_cost(xs_a, us_a)
            better = c_a < best[2]
            take = lambda a, b: jnp.where(better, a, b)  # noqa: E731
            return (jax.tree.map(take, xs_a, best[0]),
                    jax.tree.map(take, us_a, best[1]),
                    take(c_a, best[2]),
                    best[3] | better)

        best = (xs, us, cost, jnp.asarray(False))
        for a in cfg.alphas:
            best = try_alpha(best, a)
        xs_n, us_n, cost_n, improved = best
        reg = jnp.where(improved, jnp.maximum(reg * 0.7, 1e-6), reg * 4.0)
        return (xs_n, us_n, cost_n, reg), cost_n

    xs0 = rollout(us_init)
    c0 = total_cost(xs0, us_init)
    (xs, us, cost, _), hist = jax.lax.scan(
        iteration, (xs0, us_init, c0, jnp.asarray(cfg.reg_init)), None,
        length=cfg.n_iters)
    converged = (c0 - cost) / jnp.maximum(c0, 1e-9) > 1e-3
    return ILQRResult(xs=xs, us=us, cost=cost, converged=converged)


@partial(jax.jit, static_argnames=("cfg", "vcfg"))
def solve_batch(x0, goal, edges, edge_mask, us_init,
                cfg: ILQRConfig = ILQRConfig(),
                vcfg: VehicleConfig = VehicleConfig()) -> ILQRResult:
    """Lockstep batched solve: all args carry a leading scenario dim."""
    return jax.vmap(lambda a, b, c, d, e: solve(a, b, c, d, e, cfg, vcfg))(
        x0, goal, edges, edge_mask, us_init)
