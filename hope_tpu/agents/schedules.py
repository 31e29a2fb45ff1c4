"""Learning-rate schedules (reference agent_base.lr_decay :81-86).

The reference recomputes lr = f(step) on the host and rewrites the optimizer's
param groups; here the schedule is an optax-native function of the update
count, so it lives inside the jitted update.
"""
from __future__ import annotations

import jax.numpy as jnp


def lr_schedule(lr: float, decay: str | None = None,
                max_steps: int = 1_000_000):
    """None -> constant; "linear" -> lr*(1 - t/T); "exp" -> lr*exp(-t/T)."""
    if decay is None:
        return lr
    if decay == "linear":
        return lambda t: lr * jnp.maximum(1.0 - t / max_steps, 0.0)
    if decay == "exp":
        return lambda t: lr * jnp.exp(-t / max_steps)
    raise ValueError(f"unknown lr decay {decay!r}")
