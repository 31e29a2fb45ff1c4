"""Kinematic single-track (bicycle) model, closed-form and Euler variants.

The reference integrates each 0.05 s sub-step with 20 explicit-Euler iterations
(``env/vehicle.py:88-96``). With constant speed and steering, that Euler recurrence
has an exact closed form via the trigonometric sum
``sum_k cos(t0 + k*d) = cos(t0 + (n-1)d/2) * sin(nd/2) / sin(d/2)``,
so the TPU step needs 4 transcendentals instead of 60 while matching the reference
trajectory to float-rounding accuracy (see tests/test_dynamics.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import VehicleConfig


class VehicleState(NamedTuple):
    """Pose + actuation, batchable: every field broadcasts over leading dims."""

    x: jnp.ndarray
    y: jnp.ndarray
    heading: jnp.ndarray
    speed: jnp.ndarray
    steer: jnp.ndarray

    @property
    def pose(self):
        return jnp.stack([self.x, self.y, self.heading], axis=-1)

    @staticmethod
    def from_pose(pose):
        z = jnp.zeros_like(pose[..., 0])
        return VehicleState(pose[..., 0], pose[..., 1], pose[..., 2], z, z)


def clip_action(action, cfg: VehicleConfig):
    """Clip [steer, speed] to the vehicle limits (reference vehicle.py:85-86)."""
    steer = jnp.clip(action[..., 0], -cfg.max_steer, cfg.max_steer)
    speed = jnp.clip(action[..., 1], -cfg.max_speed, cfg.max_speed)
    return steer, speed


def substep_closed_form(state: VehicleState, action, cfg: VehicleConfig) -> VehicleState:
    """One dt-long sub-step (the reference's 20-Euler-iteration block), closed form."""
    steer, speed = clip_action(action, cfg)
    n = cfg.euler_iters
    h = cfg.dt / n
    delta = speed * jnp.tan(steer) / cfg.wheel_base * h  # per-iter heading increment

    half = 0.5 * delta
    # sum_{k=0}^{n-1} cos/sin(theta0 + k*delta); ratio -> n as delta -> 0
    sin_half = jnp.sin(half)
    tiny = jnp.abs(sin_half) < 1e-7
    ratio = jnp.where(tiny, float(n), jnp.sin(n * half) / jnp.where(tiny, 1.0, sin_half))
    mid = state.heading + (n - 1) * half
    dx = speed * h * jnp.cos(mid) * ratio
    dy = speed * h * jnp.sin(mid) * ratio
    return VehicleState(
        x=state.x + dx,
        y=state.y + dy,
        heading=state.heading + n * delta,
        speed=speed,
        steer=steer,
    )


def substep_trajectory(state: VehicleState, action, cfg: VehicleConfig,
                       n_substeps: int | None = None) -> VehicleState:
    """All ``n`` intermediate sub-step states of one control step at once:
    a VehicleState with a leading (n,) axis holding the pose after k = 1..n
    sub-steps.

    Because speed and steering are constant within a control step, every
    intermediate pose is the same closed-form arc evaluated at k*dt — so the
    reference's sequential per-substep loop (``car_parking_base.py:235-276``)
    becomes one parallel evaluation, and the per-substep arrival/collision/
    rollback semantics reduce to a first-event selection over the k axis.
    """
    n = cfg.n_substep if n_substeps is None else n_substeps
    steer, speed = clip_action(action, cfg)
    m = cfg.euler_iters
    h = cfg.dt / m
    delta = speed * jnp.tan(steer) / cfg.wheel_base * h

    iters = jnp.arange(1, n + 1) * m                 # Euler iters to pose k
    half = 0.5 * delta
    sin_half = jnp.sin(half)
    tiny = jnp.abs(sin_half) < 1e-7
    ratio = jnp.where(
        tiny, iters.astype(jnp.result_type(half)),
        jnp.sin(iters * half) / jnp.where(tiny, 1.0, sin_half),
    )
    mid = state.heading + (iters - 1) * half
    ones = jnp.ones_like(ratio)
    return VehicleState(
        x=state.x + speed * h * jnp.cos(mid) * ratio,
        y=state.y + speed * h * jnp.sin(mid) * ratio,
        heading=state.heading + iters * delta,
        speed=speed * ones,
        steer=steer * ones,
    )


def substep_euler(state: VehicleState, action, cfg: VehicleConfig) -> VehicleState:
    """Literal 20-iteration Euler sub-step (reference vehicle.py:88-93); used by the
    parity tests as the ground-truth recurrence."""
    steer, speed = clip_action(action, cfg)
    h = cfg.dt / cfg.euler_iters
    dth = speed * jnp.tan(steer) / cfg.wheel_base * h

    def body(_, carry):
        x, y, th = carry
        x = x + speed * jnp.cos(th) * h
        y = y + speed * jnp.sin(th) * h
        return x, y, th + dth

    x, y, th = jax.lax.fori_loop(0, cfg.euler_iters, body, (state.x, state.y, state.heading))
    return VehicleState(x, y, th, speed, steer)


def step(state: VehicleState, action, cfg: VehicleConfig, n_substeps: int | None = None,
         exact: bool = True) -> VehicleState:
    """Full control step = ``n_substeps`` sub-steps (reference KSModel.step with
    step_time=NUM_STEP). Since speed/steer are constant over the step, the closed
    form collapses all sub-steps into one call with n_iter scaled."""
    n_substeps = cfg.n_substep if n_substeps is None else n_substeps
    if exact:
        scaled = VehicleConfig(
            wheel_base=cfg.wheel_base,
            max_speed=cfg.max_speed,
            max_steer=cfg.max_steer,
            dt=cfg.dt * n_substeps,
            euler_iters=cfg.euler_iters * n_substeps,
            n_substep=cfg.n_substep,
        )
        return substep_closed_form(state, action, scaled)
    out = state
    for _ in range(n_substeps):
        out = substep_closed_form(out, action, cfg)
    return out
