"""Dead-backend watchdog for bench entry points.

The benches run on whatever backend the environment configures (on this
box: the axon-tunnelled TPU).  If the tunnel transport dies, the very first
backend touch (``jax.devices()``) blocks forever inside the PJRT C-API
client constructor — no exception, no timeout — and the whole bench run
hangs instead of producing a JSON line.

``ensure_live_backend`` probes the configured backend in a *subprocess*
(the only way to bound a hang that sits inside a C extension) and, when the
probe cannot complete a trivial jitted op within the timeout, flips this
process to the CPU backend before it has initialized anything.  A CPU
number with a clear provenance marker beats a bench that never returns.

Counterpart in the reference: none — its benches run in-process on the
host CPU and cannot lose their device (benchmarks/python_vs_cpp.py).
"""

from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["ensure_live_backend"]

_PROBE = (
    "import jax, jax.numpy as jnp; "
    "jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))"
)


def _get_config():
    """Seam for tests: the live jax.config object."""
    import jax

    return jax.config


def ensure_live_backend(timeout_s: float = 240.0) -> str:
    """Probe the default JAX backend; fall back to CPU if it is dead.

    Returns ``"default"`` when the configured backend answered the probe
    (or probing was skipped), ``"cpu-fallback"`` when the probe hung or
    crashed and this process was switched to the CPU platform.

    Must be called BEFORE anything touches the backend in this process —
    once a backend initializes, the platform choice is frozen.

    Skipped (returns ``"default"``) when:
      - ``PDE_NO_DEVICE_GUARD=1`` (explicit opt-out),
      - the process is already pinned to CPU via ``jax.config`` — probing
        the (possibly dead) device backend would stall a run that was never
        going to touch it.
    """
    if os.environ.get("PDE_NO_DEVICE_GUARD"):
        return "default"
    env_timeout = os.environ.get("PDE_DEVICE_GUARD_TIMEOUT")
    if env_timeout:
        timeout_s = float(env_timeout)

    config = _get_config()
    try:
        # 'axon,cpu' means axon is tried FIRST (and a dead tunnel blocks
        # there forever — the cpu entry never gets a turn), so only skip
        # the probe when cpu is the leading platform choice.
        platforms = str(config.jax_platforms or "")
        if platforms.split(",")[0].strip() == "cpu":
            return "default"
    except AttributeError:  # very old jax — no such config key
        pass

    try:
        subprocess.run(
            [sys.executable, "-c", _PROBE],
            timeout=timeout_s,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return "default"
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError, OSError):
        print(
            "# device_guard: backend probe failed/hung "
            f"(timeout {timeout_s:.0f}s) — falling back to CPU",
            file=sys.stderr,
        )
        try:
            config.update("jax_platforms", "cpu")
        except RuntimeError:
            # backend already initialized in this process; nothing to save
            pass
        return "cpu-fallback"
