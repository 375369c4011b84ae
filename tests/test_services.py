"""Service-entrypoint tests (pde_tpu/services.py) — the deploy layer's CMDs
must be real, working loops, driven here with the simulated provider and an
in-memory DB (the reference's fake-infrastructure strategy, SURVEY.md §4)."""

import numpy as np
import pytest

from pde_tpu import services
from pde_tpu.data.providers import SimulatedDataProvider
from pde_tpu.database.db import TimeSeriesDB


@pytest.fixture
def db():
    return TimeSeriesDB(":memory:")


@pytest.fixture
def provider():
    return SimulatedDataProvider(seed=3)


class TestServiceLoop:
    def test_runs_n_iterations_and_stops(self):
        calls = []
        loop = services.ServiceLoop("t", lambda: calls.append(1), interval_s=0.0,
                                    max_iterations=3)
        assert loop.run() == 0
        assert len(calls) == 3

    def test_survives_step_failures(self):
        state = {"n": 0}

        def flaky():
            state["n"] += 1
            if state["n"] == 1:
                raise RuntimeError("boom")
            return "ok"

        loop = services.ServiceLoop("t", flaky, interval_s=0.0, max_iterations=3)
        assert loop.run() == 0  # kept serving
        assert loop.failures == 1
        assert loop.iterations == 3

    def test_stop_breaks_sleep(self):
        loop = services.ServiceLoop("t", lambda: None, interval_s=60.0, max_iterations=5)
        orig = loop.step
        loop.step = lambda: (loop.stop(), orig())
        assert loop.run() == 0
        assert loop.iterations == 1


class TestSteps:
    def test_ingestion_step_stores_bars(self, provider, db):
        out = services.ingestion_step(provider=provider, db=db, symbols=["SPY"])
        assert out["SPY"] in ("SUCCESS", "PARTIAL")
        assert len(db.query_market_prices("SPY")) > 100

    def test_signals_step_persists_candidates(self, provider, db):
        out = services.signals_step(provider=provider, db=db, symbols=["SPY", "QQQ"])
        assert set(out) == {"SPY", "QQQ"}
        for sym, status in out.items():
            assert status in ("candidate", "no_signal", "insufficient_data")
            if status == "candidate":
                assert db.query_signals(asset=sym)

    @pytest.mark.slow
    def test_calibration_step_runs_orchestrator(self, provider, db):
        out = services.calibration_step(provider=provider, db=db, symbols=["SPY"])
        assert out["SPY"] in ("SUCCESS", "PARTIAL", "FAILED")

    def test_execution_step_trades_a_session(self, monkeypatch):
        monkeypatch.setenv("PDE_SYMBOLS", "SPY")
        out = services.execution_step(symbols=["SPY"], n_ticks=40)
        assert "orders_submitted" in out

    def test_main_rejects_unknown_service(self):
        assert services.main(["nope"]) == 2
        assert services.main([]) == 2

    def test_main_runs_bounded_loop(self, monkeypatch):
        monkeypatch.setenv("PDE_SERVICE_MAX_ITERATIONS", "1")
        monkeypatch.setenv("PDE_SERVICE_INTERVAL_S", "0")
        monkeypatch.setenv("PDE_SYMBOLS", "SPY")
        monkeypatch.setenv("PDE_DB_PATH", ":memory:")
        assert services.main(["data-ingestion"]) == 0
