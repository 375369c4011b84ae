"""Unit tests for the dead-backend watchdog (pde_tpu.utils.device_guard).

The real failure mode it guards — a PJRT client constructor blocking forever
on a dead tunnel — can't be reproduced hermetically, so these tests exercise
the decision logic around the subprocess probe instead: skip conditions,
the fallback path on timeout/crash, and the success path.
"""

import subprocess

import pytest

from pde_tpu.utils import device_guard


def test_skip_when_opted_out(monkeypatch):
    monkeypatch.setenv("PDE_NO_DEVICE_GUARD", "1")

    def boom(*a, **k):  # probe must not run at all
        raise AssertionError("probe ran despite opt-out")

    monkeypatch.setattr(subprocess, "run", boom)
    assert device_guard.ensure_live_backend() == "default"


def test_skip_when_cpu_is_leading_platform(monkeypatch):
    import jax

    # conftest pins the suite to CPU, so this is the live configuration
    assert str(jax.config.jax_platforms).split(",")[0].strip() == "cpu"

    def boom(*a, **k):
        raise AssertionError("probe ran despite cpu platform")

    monkeypatch.setattr(subprocess, "run", boom)
    assert device_guard.ensure_live_backend() == "default"


def _force_probe(monkeypatch):
    """Make the guard believe a device backend is configured first."""
    import jax

    class FakeConfig:
        jax_platforms = "axon,cpu"

        @staticmethod
        def update(key, value):
            FakeConfig.updated = (key, value)

    monkeypatch.setattr(device_guard, "_get_config", lambda: FakeConfig)
    return FakeConfig


def test_fallback_on_probe_timeout(monkeypatch):
    cfg = _force_probe(monkeypatch)

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout", 0))

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert device_guard.ensure_live_backend(timeout_s=1.0) == "cpu-fallback"
    assert cfg.updated == ("jax_platforms", "cpu")


def test_fallback_on_probe_crash(monkeypatch):
    cfg = _force_probe(monkeypatch)

    def fake_run(*a, **k):
        raise subprocess.CalledProcessError(returncode=1, cmd="probe")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert device_guard.ensure_live_backend(timeout_s=1.0) == "cpu-fallback"
    assert cfg.updated == ("jax_platforms", "cpu")


def test_default_on_probe_success(monkeypatch):
    _force_probe(monkeypatch)
    calls = {}

    def fake_run(*a, **k):
        calls["timeout"] = k["timeout"]
        return subprocess.CompletedProcess(args=a, returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert device_guard.ensure_live_backend(timeout_s=7.0) == "default"
    assert calls["timeout"] == 7.0


def test_env_timeout_override(monkeypatch):
    _force_probe(monkeypatch)
    monkeypatch.setenv("PDE_DEVICE_GUARD_TIMEOUT", "3.5")
    calls = {}

    def fake_run(*a, **k):
        calls["timeout"] = k["timeout"]
        return subprocess.CompletedProcess(args=a, returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert device_guard.ensure_live_backend(timeout_s=99.0) == "default"
    assert calls["timeout"] == 3.5
