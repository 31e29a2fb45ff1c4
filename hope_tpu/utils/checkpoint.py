"""Orbax checkpointing of full agent states (reference saves torch state_dicts +
pickled optimizers/normalizer — agent_base.py:94-130; here the whole pytree —
params, optimizer states, Welford stats, step counters — round-trips)."""
from __future__ import annotations

import os

import jax


def save_checkpoint(path: str, state, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, f"step_{step}"), state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, abstract_state, step: int | None = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        steps = [int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")]
        step = max(steps)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(
        os.path.join(path, f"step_{step}"),
        jax.tree.map(lambda x: x, abstract_state),
    )
