"""Persistent XLA compilation cache.

This environment pays ~0.4 s per fresh XLA compilation (remote-plugin backend
init + no default cache); enabling the on-disk cache makes warm runs of the
test suite / bench near-instant. Call once before any JAX computation.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    respect_platform_env()
    path = path or os.environ.get("HOPE_TPU_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def respect_platform_env() -> None:
    """Honor a caller-set JAX_PLATFORMS env var.

    The image's sitecustomize registers the axon TPU backend at interpreter
    startup and pins the platform through jax.config, which silently overrides
    ``JAX_PLATFORMS=cpu`` set on the command line.  Re-applying the env var
    through jax.config is the reliable switch (same trick as
    tests/conftest.py) — without it, "CPU" runs land on the remote TPU chip.
    """
    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p and p != "axon":
        jax.config.update("jax_platforms", p)
