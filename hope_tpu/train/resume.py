"""Full-fidelity training-loop checkpointing (SURVEY §5).

The reference saves network state_dicts + pickled optimizers/normalizer
(``model/agent_base.py:94-130``); the SURVEY blueprint additionally demands the
training-loop PRNG keys and curriculum state so a killed run resumes on the
same trajectory.  Here the *device* side (agent pytree, env/hybrid state,
replay ring, loop PRNG key, scene pool + its key) round-trips through one
orbax checkpoint, and the *host* side (curriculum choosers with their numpy
bit-generator states, reset-queue rng, loop counters) through a JSON blob
saved next to it.

A resumed run reproduces the uninterrupted run's chunk stream exactly on CPU
(bitwise-deterministic kernels — ``tests/test_checkpoint.py``); on TPU the
trajectory may diverge within normal float non-determinism.
"""
from __future__ import annotations

import json
import os

import numpy as np


def device_blob(agent_state, env_state, hybrid, obs, pool_idx, replay, key,
                pool_scene, pool_key) -> dict:
    """The device-side training-loop pytree for one orbax save."""
    return {
        "agent": agent_state,
        "env": env_state,
        "hybrid": hybrid,
        "obs": obs,
        "pool_idx": pool_idx,
        "replay": replay,
        "key": key,
        "pool": pool_scene,
        "pool_key": pool_key,
    }


def host_blob(scene_chooser, dlp_chooser, queue_rng, counters: dict) -> dict:
    """Host-side loop state: curriculum choosers, reset-queue rng, counters."""
    return {
        "scene_chooser": scene_chooser.get_state(),
        "dlp_chooser": None if dlp_chooser is None else dlp_chooser.get_state(),
        "queue_rng": queue_rng.bit_generator.state,
        "counters": counters,
    }


def save_full(path: str, step: int, device_state: dict, host_state: dict,
              single_host: bool = False):
    from ..utils.checkpoint import save_checkpoint

    save_checkpoint(path, device_state, step, single_host=single_host)
    with open(os.path.join(os.path.abspath(path), f"host_{step}.json"),
              "w") as f:
        json.dump(host_state, f)


def _latest_step(path: str) -> int:
    steps = [int(d.split("_")[1]) for d in os.listdir(path)
             if d.startswith("step_") and not d.endswith(".json")]
    return max(steps)


def load_full(path: str, abstract_device_state: dict):
    """Restore a full-fidelity checkpoint.

    Returns (device_state, host_state, step); host_state is None when the
    checkpoint predates full-fidelity saves (agent-only layout) — in that case
    device_state is also None and the caller falls back to the agent-only
    restore path.
    """
    from ..utils.checkpoint import load_checkpoint

    path = os.path.abspath(path)
    step = _latest_step(path)
    host_path = os.path.join(path, f"host_{step}.json")
    if not os.path.exists(host_path):
        return None, None, step
    device = load_checkpoint(path, abstract_device_state, step)
    with open(host_path) as f:
        host = json.load(f)
    return device, host, step


def restore_host(host: dict, scene_chooser, dlp_chooser, queue_rng) -> dict:
    scene_chooser.set_state(host["scene_chooser"])
    if dlp_chooser is not None and host["dlp_chooser"] is not None:
        dlp_chooser.set_state(host["dlp_chooser"])
    queue_rng.bit_generator.state = host["queue_rng"]
    return host["counters"]


__all__ = [
    "device_blob", "host_blob", "save_full", "load_full", "restore_host",
]
