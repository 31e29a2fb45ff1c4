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


def _to_global(x, sh: NamedSharding):
    """Place host/process-local data under ``sh``.

    Single process: plain ``device_put``.  Multi-process (the mesh spans
    non-addressable devices): every process holds an IDENTICAL copy of the
    data (the trainers seed all host rngs identically), so each builds its
    addressable shards via ``make_array_from_callback`` — the standard
    SPMD-ingest path that rides DCN on pods."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    import numpy as np  # noqa: F811

    shape = np.shape(x)
    return jax.make_array_from_callback(
        shape, sh, lambda idx: np.asarray(x[idx]))


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf's leading dim over the mesh axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: _to_global(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: _to_global(x, sh), tree)


import functools


@functools.lru_cache(maxsize=8)
def _gather_fn(mesh: Mesh):
    return jax.jit(lambda t: t, out_shardings=replicated(mesh))


def gather_replicated(tree, mesh: Mesh):
    """Reshard a (possibly dp-sharded) pytree to fully-replicated so every
    process can materialize it on host (jitted identity with replicated
    out_shardings = one allgather).  The jitted identity is cached per mesh so
    per-chunk gathers reuse the compiled executable instead of re-tracing."""
    return _gather_fn(mesh)(tree)


def barrier(name: str, timeout_s: int = 600):
    """Rendezvous all processes on the coordination-service barrier (gRPC,
    long timeout) — used before dispatching the first cross-process collective
    computation, whose Gloo/NCCL context formation has a short hard deadline
    that setup-phase compile skew between processes can blow through."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(
        name, timeout_in_ms=timeout_s * 1000)


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Join the multi-host runtime (no-op on a single process).  On TPU pods
    the arguments come from the environment automatically."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
