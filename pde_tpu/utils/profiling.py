"""Profiling and latency instrumentation.

The reference measures latency with Prometheus histograms + time.time deltas
(SURVEY.md section 5, monitoring/metrics.py:448-525); the TPU equivalent adds
device-aware timing (block_until_ready around compiled calls, compile/run
split) and `jax.profiler` trace capture for per-kernel analysis.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax

__all__ = ["DeviceTimer", "time_jitted", "trace", "Timings"]


@dataclass
class Timings:
    """Compile/run split for a jitted callable."""

    compile_s: float
    median_run_s: float
    runs_s: List[float] = field(default_factory=list)

    @property
    def per_second(self) -> float:
        return 1.0 / self.median_run_s if self.median_run_s > 0 else float("inf")


def time_jitted(fn: Callable, *args, n_runs: int = 10, **kwargs) -> Timings:
    """Time a jitted function with proper device synchronization.

    First call (compile + run) is reported separately; subsequent calls are
    synced with block_until_ready so dispatch pipelining doesn't understate
    latency.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return Timings(compile_s=compile_s, median_run_s=runs[len(runs) // 2], runs_s=runs)


class DeviceTimer:
    """Accumulating section timer with device sync.

    >>> timer = DeviceTimer()
    >>> with timer("pricing"):
    ...     prices = price_fn(params).block_until_ready()
    >>> timer.report()
    """

    def __init__(self):
        self.sections: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # sync everything outstanding so the section owns its device time
            try:
                jax.effects_barrier()
            except Exception:  # noqa: BLE001 - older jax versions
                pass
            self.sections.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, times in self.sections.items():
            s = sorted(times)
            out[name] = {
                "n": len(s),
                "total_s": sum(s),
                "median_s": s[len(s) // 2],
                "max_s": s[-1],
            }
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pde_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
