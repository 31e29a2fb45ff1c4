"""On-device replay ring buffer (reference model/replay_memory.py).

The reference keeps host-side deques of python dicts; here the buffer is a
fixed-capacity pytree of device arrays with a cursor, so sampling feeds the
jitted update directly with zero host transfers.  BEV images are stored as
uint8 to keep HBM use ~4x lower (exactly invertible quantization of the
rasterizer's /255 colors).
"""
from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class Replay:
    data: dict          # field -> (capacity, ...) array
    cursor: jnp.ndarray
    size: jnp.ndarray
    capacity: int = flax.struct.field(pytree_node=False)


def _store_dtype(k, v):
    if k.endswith("img"):
        return jnp.uint8
    return v.dtype


def _encode(k, v):
    return (v * 255.0 + 0.5).astype(jnp.uint8) if k.endswith("img") else v


def _decode(k, v):
    return v.astype(jnp.float32) / 255.0 if k.endswith("img") else v


def create(capacity: int, example: dict) -> Replay:
    """``example`` is one transition pytree WITHOUT a batch dim, e.g.
    {obs/..., action, reward, done, log_prob, next_obs/...} flattened with
    '/'-joined keys."""
    data = {
        k: jnp.zeros((capacity,) + v.shape, _store_dtype(k, v))
        for k, v in example.items()
    }
    return Replay(data=data, cursor=jnp.zeros((), jnp.int32),
                  size=jnp.zeros((), jnp.int32), capacity=capacity)


def push_batch(buf: Replay, batch: dict) -> Replay:
    """Append B transitions (leading dim B) at the ring cursor."""
    any_v = next(iter(batch.values()))
    b = any_v.shape[0]
    idx = (buf.cursor + jnp.arange(b)) % buf.capacity
    data = {
        k: buf.data[k].at[idx].set(_encode(k, v)) for k, v in batch.items()
    }
    return Replay(
        data=data,
        cursor=(buf.cursor + b) % buf.capacity,
        size=jnp.minimum(buf.size + b, buf.capacity),
        capacity=buf.capacity,
    )


def sample(buf: Replay, key, batch_size: int) -> dict:
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return {k: _decode(k, v[idx]) for k, v in buf.data.items()}


def unflatten_obs(flat: dict, prefix: str) -> dict:
    """Extract '{prefix}/<modality>' entries back into an obs dict."""
    p = prefix + "/"
    return {k[len(p):]: v for k, v in flat.items() if k.startswith(p)}


def flatten_obs(obs: dict, prefix: str) -> dict:
    return {f"{prefix}/{k}": v for k, v in obs.items()}
