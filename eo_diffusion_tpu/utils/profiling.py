"""Profiling / tracing hooks (the observability layer the reference lacks,
SURVEY.md §5 "tracing/profiling: none").

* :func:`trace` -- context manager around ``jax.profiler`` trace capture
  (view with TensorBoard / xprof).
* :class:`StepTimer` -- wall-clock step timing with device-sync fetches that
  work through the axon TPU tunnel (plain ``block_until_ready`` does not
  reliably block there -- measured; a scalar host fetch does).
* :func:`flops_of` -- XLA-estimated FLOPs of a jitted function, for MFU math.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "StepTimer", "flops_of", "sync"]


def sync(x: Any) -> None:
    """Force full device execution (axon-safe: fetch a scalar to host)."""
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)).ravel()[0])


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace: ``with trace("/tmp/tb"): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer: ``with timer.step(): state, m = train_step(...)``.

    Reports steps/sec and (given flops) model FLOPs utilisation.
    """

    def __init__(self, flops_per_step: Optional[float] = None, window: int = 50):
        self.flops = flops_per_step
        self.window = window
        self.times: List[float] = []

    @contextlib.contextmanager
    def step(self, sync_on: Any = None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            sync(sync_on)
        self.times.append(time.perf_counter() - t0)
        if len(self.times) > self.window:
            self.times.pop(0)

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self, peak_flops: float = 197e12) -> Dict[str, float]:
        dt = self.mean_step_time
        out = {"step_time_s": dt, "steps_per_sec": 1.0 / dt if dt else 0.0}
        if self.flops:
            out["tflops_per_sec"] = self.flops / dt / 1e12 if dt else 0.0
            out["mfu"] = self.flops / dt / peak_flops if dt else 0.0
        return out


def flops_of(fn: Callable, *args, **kwargs) -> float:
    """XLA cost-analysis FLOPs of ``jax.jit(fn)`` at the given args."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))
