"""Tests for the remaining inventory pieces: multi-strategy manager,
alternative data, storage management, migrations, and the driver entries."""

from datetime import date, datetime, timedelta, timezone

import numpy as np
import pytest

from pde_tpu.backtest.multi_strategy import MultiStrategyManager, get_optimal_strategy
from pde_tpu.data.alternative import (
    AlternativeDataManager,
    SimulatedEventProvider,
    SimulatedMacroProvider,
)
from pde_tpu.data.storage import DataRetentionManager, RetentionPolicy, StorageManager
from pde_tpu.database import TimeSeriesDB
from pde_tpu.database.migrations import MigrationRunner


class TestMultiStrategy:
    def test_vote_blends_families(self):
        mgr = MultiStrategyManager(["X"])
        up = 100 * np.exp(np.linspace(0, 0.3, 120))  # strong uptrend
        score = mgr.vote(up)
        assert score > 0.2

    def test_event_driven_run(self):
        from pde_tpu.backtest import ArrayDataHandler, BacktestEngine, Portfolio
        from pde_tpu.backtest.data_handler import SyntheticDataHandler
        from pde_tpu.backtest.execution import InstantExecutionHandler

        data = SyntheticDataHandler(["X"], n_bars=300, annual_vol=0.35, seed=23)
        engine = BacktestEngine(
            data, MultiStrategyManager(["X"]), Portfolio(), InstantExecutionHandler()
        )
        res = engine.run()
        assert res.n_bars == 300

    def test_optimal_lookup(self):
        assert get_optimal_strategy("UNKNOWN")["strategy"] == "momentum"
        MultiStrategyManager.set_optimization_results(
            {"AAPL": {"strategy": "rsi", "params": {"period": 14}}}
        )
        assert get_optimal_strategy("aapl")["strategy"] == "rsi"


class TestAlternativeData:
    def test_macro_series(self):
        p = SimulatedMacroProvider(seed=1)
        s = p.get_series("DFF", date(2026, 1, 1), date(2026, 4, 1))
        assert len(s.values) == len(s.dates) == 90
        assert 4.0 < s.latest() < 6.5  # near the DFF level

    def test_events_quarterly(self):
        evs = SimulatedEventProvider().get_events("AAPL", date(2026, 1, 1), date(2026, 12, 31))
        assert len(evs) == 4
        assert all(e.event_type.value == "earnings" for e in evs)

    def test_market_context_and_blackout(self):
        mgr = AlternativeDataManager()
        ctx = mgr.market_context(["AAPL", "JPM"], as_of=date(2026, 8, 14))
        assert set(ctx["sentiment"]) == {"AAPL", "JPM"}
        assert -1 <= ctx["sentiment"]["AAPL"] <= 1
        assert ctx["fed_funds"] is not None
        evs = SimulatedEventProvider().get_events("AAPL", date(2026, 1, 1), date(2026, 12, 31))
        assert mgr.earnings_blackout("AAPL", evs[0].event_date)
        assert not mgr.earnings_blackout("AAPL", evs[0].event_date + timedelta(days=30))


class TestStorage:
    @pytest.fixture
    def db(self):
        db = TimeSeriesDB(":memory:")
        rows = [
            {"time": (datetime(2026, 1, 1, tzinfo=timezone.utc) + timedelta(hours=6 * i)).isoformat(),
             "symbol": "SPY", "open": 100.0, "high": 101.0, "low": 99.0,
             "close": 100.0 + 0.1 * i, "volume": 1000.0}
            for i in range(40)  # 10 days x 4 intraday bars
        ]
        db.insert_market_prices(rows)
        return db

    def test_stats(self, db):
        stats = StorageManager(db).stats()
        assert stats.table_rows["market_prices"] == 40
        assert stats.total_bytes > 0
        assert stats.oldest["market_prices"].startswith("2026-01-01")

    def test_daily_aggregate(self, db):
        mgr = StorageManager(db)
        n = mgr.create_daily_aggregate()
        assert n == 10
        con = db._conn()
        row = con.execute(
            "SELECT open, close, volume FROM market_prices_daily WHERE day='2026-01-01'"
        ).fetchone()
        assert row[0] == 100.0  # first bar's open
        assert row[2] == 4000.0  # summed volume

    def test_retention(self, db):
        ret = DataRetentionManager(
            db, [RetentionPolicy("market_prices", keep_days=5)]
        )
        out = ret.enforce(as_of=datetime(2026, 1, 11, tzinfo=timezone.utc))
        assert out["market_prices"] > 0
        remaining = db.query_market_prices("SPY")
        assert all(r["time"] >= "2026-01-06" for r in remaining)

    def test_compact_runs(self, db):
        StorageManager(db).compact()  # must not raise


class TestMigrations:
    def test_upgrade_and_history(self):
        db = TimeSeriesDB(":memory:")
        runner = MigrationRunner(db)
        assert runner.current_version == 1
        applied = runner.upgrade()
        assert applied == [2, 3, 4]
        assert runner.current_version == 4
        assert runner.pending() == []
        # idempotent
        assert runner.upgrade() == []
        names = [h["name"] for h in runner.history()]
        assert names == ["baseline", "add_calibration_runs", "add_fills_table", "add_equity_curve"]
        # new tables usable
        con = db._conn()
        con.execute("INSERT INTO equity_curve VALUES ('2026-01-01T00:00:00', 1e6, 5e5, 4e5)")
        assert con.execute("SELECT COUNT(*) FROM equity_curve").fetchone()[0] == 1


class TestGraftEntry:
    def test_entry_jits(self):
        import jax

        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (100,)
        assert bool(np.all(np.isfinite(np.asarray(out))))

    def test_dryrun_multichip_on_virtual_mesh(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out
