"""Welford running observation normalization (reference model/state_norm.py).

Carried as a pytree of per-modality stats; only lidar + target are normalized
(reference DEFAULT_UPDATE_MODAL).  The batched update folds a whole vectorized
env step at once (the reference updates one obs at a time on next_obs pushes —
sac_agent.py:217).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

NORMALIZED_KEYS = ("lidar", "target")


@flax.struct.dataclass
class NormState:
    mean: dict
    S: dict
    n: jnp.ndarray

    @staticmethod
    def create(obs_shape: dict) -> "NormState":
        keys = [k for k in obs_shape if k in NORMALIZED_KEYS]
        return NormState(
            mean={k: jnp.zeros(obs_shape[k]) for k in keys},
            S={k: jnp.zeros(obs_shape[k]) for k in keys},
            n=jnp.zeros((), jnp.int32),
        )


def normalize(obs: dict, st: NormState) -> dict:
    out = dict(obs)
    n = jnp.maximum(st.n, 1)
    for k in st.mean:
        std = jnp.sqrt(st.S[k] / n)
        out[k] = (obs[k] - st.mean[k]) / (std + 1e-8)
    return out


def update(st: NormState, obs: dict) -> NormState:
    """Fold a batch of observations (leading dim B) into the running stats
    with a batched Welford step."""
    any_key = next(iter(st.mean))
    b = obs[any_key].shape[0]
    new_n = st.n + b
    mean, S = {}, {}
    for k in st.mean:
        x = obs[k]
        batch_mean = jnp.mean(x, axis=0)
        batch_S = jnp.sum((x - batch_mean) ** 2, axis=0)
        delta = batch_mean - st.mean[k]
        tot = new_n.astype(x.dtype)
        mean[k] = st.mean[k] + delta * (b / tot)
        S[k] = st.S[k] + batch_S + delta**2 * (st.n.astype(x.dtype) * b / tot)
    return NormState(mean=mean, S=S, n=new_n)
