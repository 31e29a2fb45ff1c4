"""Profiling and tracing utilities.

The reference has no profiling beyond an inline ``__main__`` timing block
(``env/parking_map_normal.py:516-526``).  Here profiling is a first-class
subsystem: ``jax.profiler`` trace capture for xprof/tensorboard, steady-state
throughput timing with explicit warmup (the axon tunnel pays one-time buffer
costs on the first post-compile call), and a compiled-cost probe that reads
XLA's flop/byte estimates to place a kernel on the roofline.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax

# v5e reference peaks (per chip): bf16 MXU, f32 VPU estimate, HBM BW
PEAKS = {"bf16_flops": 394e12, "f32_flops": 0.9e12, "hbm_bytes": 819e9}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 20,
            **kwargs) -> dict:
    """Steady-state wall time of a jitted callable.

    Runs ``warmup`` untimed calls (compile + one-time buffer costs), then
    ``iters`` timed calls ending in a single ``block_until_ready``.

    Returns {"mean_ms", "calls_per_sec", "iters"}.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1e3, "calls_per_sec": 1.0 / dt, "iters": iters}


def compiled_cost(fn: Callable, *args, **kwargs) -> dict:
    """XLA cost analysis of the compiled computation: flops, bytes accessed,
    and roofline utilization estimates against the v5e peaks."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    cost = dict(cost or {})
    out = {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
    }
    timing = time_fn(jax.jit(fn), *args, **kwargs)
    out["mean_ms"] = timing["mean_ms"]
    sec = timing["mean_ms"] / 1e3
    if out["flops"]:
        out["achieved_tflops"] = out["flops"] / sec / 1e12
        out["f32_roofline_frac"] = out["flops"] / sec / PEAKS["f32_flops"]
    if out["bytes_accessed"]:
        out["achieved_gbps"] = out["bytes_accessed"] / sec / 1e9
        out["hbm_roofline_frac"] = out["bytes_accessed"] / sec / PEAKS["hbm_bytes"]
    return out


@dataclass
class StepTimer:
    """Rolling throughput counter for training/rollout loops.

    >>> timer = StepTimer(unit="env-steps")
    >>> timer.tick(n=1024)   # after each batched step
    >>> timer.report()       # {"unit_per_sec": ..., "steps": ...}
    """

    unit: str = "steps"
    window: int = 50
    _times: list = field(default_factory=list)
    _counts: list = field(default_factory=list)
    total: int = 0

    def tick(self, n: int = 1):
        self._times.append(time.perf_counter())
        self._counts.append(n)
        self.total += n
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._counts.pop(0)

    def report(self) -> Optional[dict]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        n = sum(self._counts[1:])
        return {"unit": self.unit, "unit_per_sec": n / dt if dt > 0 else None,
                "total": self.total}


class MetricsWriter:
    """JSONL metrics sink with optional TensorBoard mirroring (the reference
    logs via torch SummaryWriter, train_HOPE_sac.py:129; torch is CPU-only in
    this image so TensorBoard is best-effort)."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        import os

        os.makedirs(log_dir, exist_ok=True)
        self._f = open(f"{log_dir}/metrics.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: dict):
        self._f.write(json.dumps({"step": step, **scalars}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)) and v is not None:
                    self._tb.add_scalar(k, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
