"""Orbax checkpointing of full agent states (reference saves torch state_dicts +
pickled optimizers/normalizer — agent_base.py:94-130; here the whole pytree —
params, optimizer states, Welford stats, step counters — round-trips)."""
from __future__ import annotations

import os

import jax


def save_checkpoint(path: str, state, step: int, single_host: bool = False):
    """``single_host``: write from THIS process only, with orbax's multihost
    coordination disabled — used by multi-process trainers after gathering the
    state to fully-replicated host arrays (orbax's own cross-process sync is
    for shard-per-host writes and deadlocks when non-writers skip the save)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    if single_host:
        import jax as _jax

        me = _jax.process_index()
        ckpt = ocp.Checkpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me}))
    else:
        ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, f"step_{step}"), state, force=True)
    if hasattr(ckpt, "wait_until_finished"):
        ckpt.wait_until_finished()   # plain Checkpointer saves synchronously


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


def load_params_only(path: str, state, step: int | None = None):
    """Restore network/normalizer state but keep this run's optimizer state
    (reference ``load(params_only=True)``, agent_base.py:110-127): every field
    of the checkpoint is adopted except the ``opt_*`` optimizer slots."""
    import dataclasses

    full = load_checkpoint(path, state, step)
    keep = {f.name: getattr(state, f.name) for f in dataclasses.fields(state)
            if f.name.startswith("opt_")}
    return full.replace(**keep)


def load_actor_only(path: str, state, step: int | None = None):
    """Graft only the policy (actor params + log_std + obs normalizer) from a
    checkpoint into ``state`` (reference PPOAgent.load_actor,
    ppo_agent.py:400-415) — critics/optimizers/counters stay fresh."""
    full = load_checkpoint(path, state, step)
    return state.replace(actor=full.actor, log_std=full.log_std, norm=full.norm)
