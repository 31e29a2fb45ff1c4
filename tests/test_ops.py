"""Pallas kernel tests (interpret mode on CPU) against the XLA reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from hope_tpu.config import ActionMaskConfig, LidarConfig
from hope_tpu.envs import build_table
from hope_tpu.envs.action_mask import step_lengths
from hope_tpu.ops import mask_step_lengths


def test_mask_step_lengths_matches_xla(rng):
    table = build_table()
    cfg = ActionMaskConfig()
    lcfg = LidarConfig()
    B = 9  # deliberately not a multiple of the kernel's env block
    raw = jnp.asarray(rng.uniform(0, 12, (B, lcfg.n_beams)).astype(np.float32))
    ext = jnp.clip(raw, 0.0, lcfg.max_range) + table.hull_base

    got = mask_step_lengths(ext, table.dist_star, cfg.n_iter, cfg.upsample,
                            interpret=True)
    ref = jax.vmap(lambda l: step_lengths(l, table, cfg, lcfg))(raw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert got.dtype == jnp.float32 and got.shape == (B, cfg.n_actions)


def test_mask_step_lengths_range(rng):
    table = build_table()
    cfg = ActionMaskConfig()
    ext = jnp.asarray(rng.uniform(0, 11, (4, 120)).astype(np.float32))
    got = mask_step_lengths(ext, table.dist_star, interpret=True)
    assert np.all(np.asarray(got) >= 0) and np.all(np.asarray(got) <= cfg.n_iter)
