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

__all__ = ["DeviceTimer", "time_jitted", "trace", "Timings", "device_keepalive"]


@dataclass
class Timings:
    """Compile/run split for a jitted callable."""

    compile_s: float
    median_run_s: float
    runs_s: List[float] = field(default_factory=list)

    @property
    def per_second(self) -> float:
        return 1.0 / self.median_run_s if self.median_run_s > 0 else float("inf")


def _force_transfer(out) -> float:
    """Pull one scalar to the host — the only sync a remote-tunnelled device
    cannot satisfy early (block_until_ready alone can report readiness
    optimistically over the axon tunnel; see docs/performance.md)."""
    import numpy as _np

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(_np.asarray(leaf).ravel()[0])


def time_jitted(fn: Callable, *args, n_runs: int = 10, **kwargs) -> Timings:
    """Time a jitted function with proper device synchronization.

    First call (compile + run) is reported separately.  Steady-state cost is
    measured by transfer-forced differencing: two batch sizes, each ending
    with one scalar pull, so both dispatch pipelining and the pull's network
    round-trip cancel out of the per-call figure.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    _force_transfer(out)
    compile_s = time.perf_counter() - t0

    def run(reps: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args, **kwargs)
        _force_transfer(out)
        return time.perf_counter() - t0

    t_small = run(2)
    t_large = run(n_runs + 2)
    per_call = max((t_large - t_small) / n_runs, 1e-12)
    return Timings(compile_s=compile_s, median_run_s=per_call, runs_s=[per_call])


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
            # Fence the device: per-device execution is in-order, so pulling
            # a freshly dispatched trivial computation waits for everything
            # the section enqueued.  (jax.effects_barrier alone only awaits
            # EFFECTFUL computations — pure jitted calls would be missed and
            # the section would record just its dispatch time.)
            try:
                jax.effects_barrier()
                import jax.numpy as jnp

                jax.device_get(jnp.zeros(()))
            except Exception:  # noqa: BLE001 - no live backend
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


@contextlib.contextmanager
def device_keepalive(interval_s: float = 0.5):
    """Keep the accelerator link warm during loops that interleave host work
    with device calls.

    On remote-tunnelled devices (e.g. a TPU attached over a network proxy)
    the link goes cold after a couple of idle seconds, after which the next
    dispatch or transfer can stall for tens of seconds.  Measured on the
    v5e tunnel: a vote loop with 3 s host gaps ran ~45 s/call cold vs 28 ms
    with this pinger.  A daemon thread dispatches a one-element add every
    ``interval_s``; on a local device this is nanoseconds of overhead.
    """
    import threading

    import jax.numpy as jnp

    stop = threading.Event()
    ping = jax.jit(lambda x: x + 1.0)
    try:
        ping(jnp.zeros((), jnp.float32)).block_until_ready()
    except Exception:  # noqa: BLE001 - no usable device: run without pinger
        yield
        return

    def loop():
        while not stop.is_set():
            try:
                ping(jnp.zeros((), jnp.float32)).block_until_ready()
            except Exception:  # noqa: BLE001 - device went away; stop quietly
                return
            stop.wait(interval_s)

    thread = threading.Thread(target=loop, daemon=True, name="pde-keepalive")
    thread.start()
    try:
        yield
    finally:
        stop.set()
        thread.join(timeout=2.0)
