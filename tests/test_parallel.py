"""Sharding: the batched env + SAC update run over an 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hope_tpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_batch_matches_single_device(rng):
    """A jitted computation over a dp-sharded batch equals the unsharded one."""
    mesh = make_mesh()
    x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))

    f = jax.jit(lambda x, w: jnp.tanh(x @ w).sum(axis=-1))
    plain = f(x, w)
    xs = shard_batch(x, mesh)
    ws = replicate(w, mesh)
    sharded = f(xs, ws)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), atol=1e-6)
    # result really is sharded over dp
    assert sharded.sharding.is_equivalent_to(batch_sharding(mesh), ndim=1)
