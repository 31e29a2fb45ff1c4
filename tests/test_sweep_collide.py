"""Pallas swept-collision kernel vs the pure-XLA traj_collides reference
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.geometry import segments_intersect
from hope_tpu.ops.sweep_collide import swept_collide


def _xla_reference(car_edges, car_live, scene_edges, scene_mask):
    """(B, K) any-hit via the plain segment kernel."""
    hits = segments_intersect(car_edges, scene_edges[:, None])   # (B, K, S, E)
    hits = hits & car_live[..., None] & scene_mask[:, None, None, :]
    return jnp.any(hits, axis=(-1, -2))


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_random(seed):
    rng = np.random.default_rng(seed)
    B, K, S, E = 4, 3, 40, 24
    car = rng.normal(size=(B, K, S, 4)).astype(np.float32) * 4
    live = rng.random((B, K, S)) > 0.3
    scene = rng.normal(size=(B, E, 4)).astype(np.float32) * 4
    mask = rng.random((B, E)) > 0.3

    want = np.asarray(_xla_reference(jnp.asarray(car), jnp.asarray(live),
                                     jnp.asarray(scene), jnp.asarray(mask)))
    got = np.asarray(swept_collide(jnp.asarray(car), jnp.asarray(live),
                                   jnp.asarray(scene), jnp.asarray(mask),
                                   interpret=True))
    np.testing.assert_array_equal(got, want)


def test_masked_entries_never_hit():
    # a dead car segment and a dead scene edge crossing at the origin
    car = jnp.zeros((1, 1, 1, 4)).at[0, 0, 0].set(jnp.asarray([-1.0, 0, 1, 0]))
    scene = jnp.zeros((1, 1, 4)).at[0, 0].set(jnp.asarray([0.0, -1, 0, 1]))
    live = jnp.ones((1, 1, 1), bool)
    mask = jnp.ones((1, 1), bool)
    assert bool(swept_collide(car, live, scene, mask, interpret=True)[0, 0])
    assert not bool(swept_collide(car, ~live, scene, mask, interpret=True)[0, 0])
    assert not bool(swept_collide(car, live, scene, ~mask, interpret=True)[0, 0])


def test_parallel_overlap_excluded():
    # collinear overlapping segments: det == 0 -> excluded, like the reference
    car = jnp.asarray([[[[-1.0, 0, 1, 0]]]])
    scene = jnp.asarray([[[-0.5, 0, 0.5, 0]]])
    live = jnp.ones((1, 1, 1), bool)
    mask = jnp.ones((1, 1), bool)
    assert not bool(swept_collide(car, live, scene, mask, interpret=True)[0, 0])
