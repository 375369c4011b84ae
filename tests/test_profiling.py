"""Profiling harness tests."""

import jax
import jax.numpy as jnp

from pde_tpu.utils.profiling import DeviceTimer, time_jitted


def test_time_jitted_compile_run_split():
    @jax.jit
    def f(x):
        return (x * x).sum()

    t = time_jitted(f, jnp.arange(1024.0), n_runs=5)
    assert t.compile_s > 0
    assert t.median_run_s > 0
    assert len(t.runs_s) >= 1
    assert t.compile_s >= t.median_run_s  # first call includes tracing


def test_device_timer_sections():
    timer = DeviceTimer()
    for _ in range(3):
        with timer("work"):
            jnp.ones(128).sum().block_until_ready()
    rep = timer.report()
    assert rep["work"]["n"] == 3
    assert rep["work"]["total_s"] >= rep["work"]["median_s"]


class TestDeviceKeepalive:
    def test_context_manager_runs_and_stops(self):
        import threading

        from pde_tpu.utils.profiling import device_keepalive

        before = threading.active_count()
        with device_keepalive(interval_s=0.05):
            import jax.numpy as jnp

            assert float(jnp.asarray(1.0) + 1.0) == 2.0
            assert any(t.name == "pde-keepalive" for t in threading.enumerate())
        # thread joins on exit
        for t in threading.enumerate():
            if t.name == "pde-keepalive":
                t.join(timeout=2.0)
                assert not t.is_alive()
        assert threading.active_count() <= before + 1
