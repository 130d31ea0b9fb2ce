"""Timing, profiling and metrics utilities.

The reference's observability is per-solve prints of alpaqa stats
(controller.py:59-61) — here a structured stats path: wall-clock timers with
``block_until_ready`` fencing, latency percentiles, and a step-metrics
accumulator mirroring alpaqa's counters (status, inner iterations, elapsed,
failures) for whole batches.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def device_timer(result: Dict[str, float], key: str = "elapsed_s"):
    """Time a block including device completion (block_until_ready fence)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        result[key] = time.perf_counter() - t0


def timed(fn, *args, **kwargs):
    """Run fn, fence the device, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def percentile_summary(samples) -> Dict[str, float]:
    s = np.asarray(samples, np.float64)
    return {
        "p50": float(np.percentile(s, 50)),
        "p90": float(np.percentile(s, 90)),
        "p99": float(np.percentile(s, 99)),
        "mean": float(s.mean()),
        "min": float(s.min()),
        "max": float(s.max()),
    }


@dataclasses.dataclass
class StepMetrics:
    """Accumulates per-MPC-step metrics across a run (the structured
    replacement for the reference's print-based stats, controller.py:59-64)."""
    latencies_s: List[float] = dataclasses.field(default_factory=list)
    inner_iterations: List[int] = dataclasses.field(default_factory=list)
    failures: int = 0
    solves: int = 0

    def record(self, latency_s: float, iters, converged) -> None:
        iters = np.asarray(iters)
        converged = np.asarray(converged)
        self.latencies_s.append(float(latency_s))
        self.inner_iterations.append(int(iters.sum()))
        self.solves += int(converged.size)
        self.failures += int((~converged).sum())

    def summary(self) -> Dict[str, object]:
        lat = percentile_summary(self.latencies_s) if self.latencies_s else {}
        total_time = float(np.sum(self.latencies_s)) if self.latencies_s else 0.0
        return {
            "solves": self.solves,
            "failures": self.failures,
            "tot_inner_iterations": int(np.sum(self.inner_iterations))
            if self.inner_iterations else 0,
            "solves_per_s": self.solves / total_time if total_time else 0.0,
            "step_latency": lat,
        }


def profile_trace(log_dir: str):
    """Context manager emitting a jax.profiler trace for xprof/tensorboard."""
    return jax.profiler.trace(log_dir)
