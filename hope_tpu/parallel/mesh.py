"""Device-mesh + sharding helpers.

The framework's distributed backbone (SURVEY.md 2b): scenario/data parallelism
over a ``('dp',)`` mesh axis — env batches and replay shards live
batch-sharded, params replicated, and XLA inserts the gradient psum across
devices/hosts when the jitted update consumes sharded batches.  Multi-host
extends the same mesh via ``jax.distributed.initialize`` (collectives ride ICI
within a slice, DCN across hosts).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf's leading dim over the mesh axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Join the multi-host runtime (no-op on a single process).  On TPU pods
    the arguments come from the environment automatically."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
