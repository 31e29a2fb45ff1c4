"""Parity of the closed-form bicycle step vs the literal Euler recurrence."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import VehicleConfig
from hope_tpu.dynamics import VehicleState, step, substep_closed_form, substep_euler

from . import oracle

CFG = VehicleConfig()


def _rand_states(rng, n):
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-10, 10, n)
    th = rng.uniform(-np.pi, np.pi, n)
    return x, y, th


def test_substep_closed_form_matches_euler(rng):
    x, y, th = _rand_states(rng, 64)
    steer = rng.uniform(-0.75, 0.75, 64)
    speed = rng.uniform(-2.5, 2.5, 64)
    st = VehicleState(jnp.asarray(x), jnp.asarray(y), jnp.asarray(th),
                      jnp.zeros(64), jnp.zeros(64))
    act = jnp.stack([jnp.asarray(steer), jnp.asarray(speed)], axis=-1)
    a = substep_closed_form(st, act, CFG)
    b = substep_euler(st, act, CFG)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=3e-5)
    np.testing.assert_allclose(np.asarray(a.y), np.asarray(b.y), atol=3e-5)
    np.testing.assert_allclose(np.asarray(a.heading), np.asarray(b.heading), atol=1e-5)


def test_substep_matches_scalar_oracle(rng):
    for _ in range(20):
        x0, y0, th0 = rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(-3, 3)
        steer, speed = rng.uniform(-0.75, 0.75), rng.uniform(-2.5, 2.5)
        want = oracle.euler_bicycle_step(
            x0, y0, th0, steer, speed, CFG.wheel_base, CFG.dt, CFG.euler_iters, 1
        )
        st = VehicleState(*map(jnp.float64, (x0, y0, th0, 0.0, 0.0))) \
            if jax.config.jax_enable_x64 else VehicleState(
                jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(th0),
                jnp.asarray(0.0), jnp.asarray(0.0))
        got = substep_closed_form(st, jnp.asarray([steer, speed]), CFG)
        np.testing.assert_allclose(float(got.x), want[0], atol=3e-5)
        np.testing.assert_allclose(float(got.y), want[1], atol=3e-5)
        np.testing.assert_allclose(float(got.heading), want[2], atol=1e-5)


def test_zero_steer_straight_line():
    st = VehicleState(*map(jnp.asarray, (0.0, 0.0, 0.5, 0.0, 0.0)))
    got = step(st, jnp.asarray([0.0, 2.0]), CFG)  # full control step: 10 substeps
    dist = 2.0 * CFG.dt * CFG.n_substep
    np.testing.assert_allclose(float(got.x), dist * np.cos(0.5), rtol=1e-6)
    np.testing.assert_allclose(float(got.y), dist * np.sin(0.5), rtol=1e-6)
    np.testing.assert_allclose(float(got.heading), 0.5, rtol=1e-6)


def test_action_clipping():
    st = VehicleState(*map(jnp.asarray, (0.0, 0.0, 0.0, 0.0, 0.0)))
    got = substep_closed_form(st, jnp.asarray([5.0, 99.0]), CFG)
    assert float(got.steer) == CFG.max_steer
    assert float(got.speed) == CFG.max_speed


def test_full_step_equals_chained_substeps(rng):
    x, y, th = _rand_states(rng, 8)
    st = VehicleState(jnp.asarray(x), jnp.asarray(y), jnp.asarray(th),
                      jnp.zeros(8), jnp.zeros(8))
    act = jnp.stack([jnp.full(8, 0.4), jnp.full(8, -1.7)], axis=-1)
    chained = st
    for _ in range(CFG.n_substep):
        chained = substep_closed_form(chained, act, CFG)
    fused = step(st, act, CFG)
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(chained.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.heading), np.asarray(chained.heading), atol=1e-6)
