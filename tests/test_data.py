"""Data pipeline + persistence tests: options/SVI, providers, validation,
streaming, calendar, ingestion/recovery, quality monitoring, HTTP API, DB."""

import os
from datetime import date, datetime, timedelta, timezone

import numpy as np
import pytest

from pde_tpu.data import options as opt
from pde_tpu.data import providers as prov
from pde_tpu.data import recovery as rec
from pde_tpu.data import reference as ref
from pde_tpu.data import streaming as stream
from pde_tpu.data import validation as dv
from pde_tpu.data.ingestion import DataIngestionPipeline, IncrementalIngestion, IngestionStatus
from pde_tpu.data.monitoring import DataQualityMonitor, QualityLevel
from pde_tpu.database import TimeSeriesDB


class TestOptionsStack:
    def test_iv_chain_round_trip(self):
        from pde_tpu.models import black_scholes as bs

        calc = opt.ImpliedVolatilityCalculator(risk_free_rate=0.05)
        strikes = np.array([90.0, 100.0, 110.0])
        vols = np.array([0.25, 0.2, 0.22])
        times = np.full(3, 0.5)
        prices = np.asarray(bs.price(100.0, strikes, 0.05, 0.0, times, vols, True))
        ivs = calc.calculate_chain(prices, 100.0, strikes, times, np.ones(3, bool))
        np.testing.assert_allclose(ivs, vols, atol=1e-6)

    def test_surface_build_and_skew(self):
        as_of = date(2026, 1, 5)
        exp = date(2026, 3, 20)
        quotes = []
        # synthetic smile: higher put-wing vols
        for k, iv in [(80, 0.30), (90, 0.25), (100, 0.21), (110, 0.20), (120, 0.21)]:
            from pde_tpu.models import black_scholes as bs

            T = (exp - as_of).days / 365.0
            mid = float(bs.price(100.0, k, 0.05, 0.0, T, iv, True))
            quotes.append(
                opt.OptionQuote(strike=float(k), expiration=exp, option_type="call",
                                bid=mid * 0.995, ask=mid * 1.005, volume=100)
            )
        proc = opt.OptionsChainProcessor(risk_free_rate=0.05)
        surface = proc.build_surface(quotes, spot_price=100.0, as_of=as_of)
        assert len(surface.points) == 5
        atm = surface.get_atm_vol(exp)
        assert abs(atm - 0.21) < 0.02
        skew = surface.get_skew(exp)
        assert skew > 0  # put wing above call wing

    def test_svi_fit_recovers_shape(self):
        true = dict(a=0.02, b=0.15, rho=-0.4, m=0.0, sigma=0.2)
        k = np.linspace(-0.4, 0.4, 15)
        w = true["a"] + true["b"] * (
            true["rho"] * (k - true["m"]) + np.sqrt((k - true["m"]) ** 2 + true["sigma"] ** 2)
        )
        svi = opt.SVIParameterization()
        svi.fit(k, w, time_to_expiry=0.5)
        fitted = np.array([svi.get_total_variance(ki) for ki in k])
        np.testing.assert_allclose(fitted, w, atol=1e-5)
        assert svi.get_implied_vol(0.0) == pytest.approx(np.sqrt(svi.get_total_variance(0.0) / 0.5))

    def test_svi_requires_fit(self):
        with pytest.raises(ValueError):
            opt.SVIParameterization().get_total_variance(0.0)


class TestProviders:
    def test_simulated_provider(self):
        p = prov.SimulatedDataProvider(seed=1)
        bars = p.get_bars("SPY", date(2025, 1, 1), date(2025, 3, 1))
        assert len(bars) == 59
        assert all(b.high >= max(b.open, b.close) for b in bars)
        q = p.get_quote("SPY")
        assert q.bid < q.ask
        chain = p.get_options_chain("SPY")
        assert len(chain) == 18  # 9 strikes x call/put
        assert {c["option_type"] for c in chain} == {"call", "put"}

    def test_deterministic(self):
        a = prov.SimulatedDataProvider(seed=7).get_bars("X", date(2025, 1, 1), date(2025, 2, 1))
        b = prov.SimulatedDataProvider(seed=7).get_bars("X", date(2025, 1, 1), date(2025, 2, 1))
        assert [x.close for x in a] == [x.close for x in b]

    def test_rate_limiter(self):
        rl = prov.RateLimiter(rate=2, period=0.2)
        assert rl.acquire()
        assert rl.acquire()
        assert not rl.acquire(timeout=0.01)  # bucket exhausted
        assert rl.acquire(timeout=1.0)  # refills

    def test_factory(self):
        assert isinstance(prov.create_provider("simulated"), prov.SimulatedDataProvider)
        assert prov.create_provider("yahoo").name == "yahoo"
        with pytest.raises(ValueError):
            prov.create_provider("nope")


class TestValidation:
    def test_ohlcv_catches_bad_rows(self):
        v = dv.MarketDataValidator()
        frame = {
            "open": np.array([100.0, 100.0, 100.0]),
            "high": np.array([101.0, 99.0, 101.0]),  # bar 1: high < low
            "low": np.array([99.0, 100.5, 99.0]),
            "close": np.array([100.5, -5.0, 100.2]),  # bar 1: negative close
        }
        res = v.validate(frame)
        assert not res.passed
        checks = {i.check for i in res.issues}
        assert "price_sanity" in checks and "ohlc_consistency" in checks

    def test_jump_warning_not_error(self):
        v = dv.MarketDataValidator(max_daily_move=0.2)
        res = v.validate({"close": np.array([100.0, 100.5, 140.0, 139.0])})
        assert res.passed  # warnings only
        assert any(i.check == "outlier_jump" for i in res.issues)

    def test_staleness(self):
        v = dv.MarketDataValidator(max_staleness_days=5)
        old = datetime.now(timezone.utc) - timedelta(days=30)
        res = v.validate({"close": np.array([1.0, 1.1]), "time": [old, old]})
        assert not res.passed

    def test_options_validator(self):
        chain = [
            {"strike": 100, "expiration": "2026-06-19", "option_type": "call", "bid": 5.0, "ask": 4.0},
            {"strike": 105, "expiration": "2026-06-19", "option_type": "call", "bid": 3.0, "ask": 3.1,
             "implied_vol": 9.0},
        ]
        res = dv.OptionsDataValidator().validate(chain)
        assert not res.passed
        checks = {i.check for i in res.issues}
        assert "crossed_quotes" in checks and "iv_range" in checks

    def test_pipeline_composition(self):
        pipe = dv.DataValidationPipeline()
        pipe.add(lambda d: dv.MarketDataValidator().validate(d))
        res = pipe.run({"close": np.array([100.0, 101.0, 100.5])})
        assert res.passed


class TestStreaming:
    def test_simulated_ticks_and_bars(self):
        p = stream.SimulatedStreamProvider(seed=3)
        mgr = stream.StreamManager(p, bar_seconds=1e-9)  # every tick closes a bar
        for _ in range(10):
            p.step(["AAA"])
        assert mgr.latest_price("AAA") is not None
        assert len(mgr.buffers["AAA"]) > 0
        assert len(mgr.bars.get("AAA", [])) >= 5

    def test_bar_aggregation_ohlc(self):
        agg = stream.BarAggregator(bar_seconds=60)
        t0 = datetime(2026, 1, 5, 14, 30, 0, tzinfo=timezone.utc)
        for i, px in enumerate([100.0, 102.0, 99.0, 101.0]):
            agg.add_trade(stream.StreamTrade("X", px, 10, time=t0 + timedelta(seconds=i)))
        bars = agg.flush()
        assert len(bars) == 1
        b = bars[0]
        assert (b.open, b.high, b.low, b.close) == (100.0, 102.0, 99.0, 101.0)
        assert b.volume == 40

    def test_ring_buffer_capacity(self):
        rb = stream.RingBuffer(capacity=5)
        for i in range(10):
            rb.append(i)
        assert len(rb) == 5
        assert rb.latest(2) == [8, 9]


class TestCalendar:
    def test_known_holidays_2026(self):
        cal = ref.TradingCalendar()
        assert not cal.is_trading_day(date(2026, 1, 1))  # New Year
        assert not cal.is_trading_day(date(2026, 7, 3))  # July 4 observed (Saturday)
        assert not cal.is_trading_day(date(2026, 11, 26))  # Thanksgiving
        assert not cal.is_trading_day(date(2026, 12, 25))  # Christmas
        assert not cal.is_trading_day(date(2026, 4, 3))  # Good Friday
        assert cal.is_trading_day(date(2026, 8, 14))  # ordinary Friday
        assert not cal.is_trading_day(date(2026, 8, 15))  # Saturday

    def test_navigation(self):
        cal = ref.TradingCalendar()
        assert cal.next_trading_day(date(2026, 8, 14)) == date(2026, 8, 17)
        assert cal.previous_trading_day(date(2026, 8, 17)) == date(2026, 8, 14)
        days = cal.trading_days_between(date(2026, 8, 10), date(2026, 8, 14))
        assert len(days) == 5

    def test_corporate_actions(self):
        prices = np.array([100.0, 100.0, 50.0, 50.0])
        dates = [date(2026, 1, d) for d in (5, 6, 7, 8)]
        split = ref.CorporateAction("X", "split", date(2026, 1, 7), 2.0)
        adj = ref.adjust_for_splits(prices, dates, [split])
        np.testing.assert_allclose(adj, [50.0, 50.0, 50.0, 50.0])

        prices = np.array([100.0, 100.0, 99.0])
        div = ref.CorporateAction("X", "dividend", date(2026, 1, 7), 1.0)
        adj = ref.adjust_for_dividends(prices, dates[:3], [div])
        np.testing.assert_allclose(adj[:2], [99.0, 99.0])
        assert adj[2] == 99.0


class TestDatabase:
    @pytest.fixture
    def db(self):
        return TimeSeriesDB(":memory:")

    def test_url_normalization(self, tmp_path):
        # sqlite URLs map to paths instead of creating files named after the
        # URL (the round-1 stray-file bug: a db literally called 'sqlite:')
        assert TimeSeriesDB._normalize_path("sqlite:") == ":memory:"
        assert TimeSeriesDB._normalize_path("sqlite://") == ":memory:"
        assert TimeSeriesDB._normalize_path("sqlite:///rel.db") == "rel.db"
        assert TimeSeriesDB._normalize_path("sqlite:////abs/x.db") == "/abs/x.db"
        assert TimeSeriesDB._normalize_path(":memory:") == ":memory:"
        # postgresql:// URLs now dispatch to the server engine (covered in
        # tests/test_pgwire.py); any OTHER scheme is still rejected
        with pytest.raises(ValueError):
            TimeSeriesDB("mysql://host/db")
        db = TimeSeriesDB("sqlite:///" + str(tmp_path / "u.db"))
        assert db.path == str(tmp_path / "u.db")

    def test_market_prices_round_trip(self, db):
        rows = [
            {"time": f"2026-01-0{i}T00:00:00", "symbol": "SPY", "close": 100.0 + i, "volume": 1e6}
            for i in range(1, 6)
        ]
        assert db.insert_market_prices(rows) == 5
        out = db.query_market_prices("SPY", start="2026-01-02T00:00:00")
        assert len(out) == 4
        assert out[0]["close"] == 102.0

    def test_model_parameter_store(self, db):
        db.store_model_parameters(
            "heston", "SPY", {"kappa": 2.0, "v0": 0.04}, {"rmse": 0.01},
            converged=True, calibration_time_ms=120,
        )
        db.store_model_parameters("heston", "SPY", {"kappa": 2.1, "v0": 0.05}, {"rmse": 0.02})
        latest = db.get_latest_model_parameters("heston", "SPY")
        assert latest["parameters"]["kappa"] == 2.1
        hist = db.get_parameter_history("heston", "SPY")
        assert len(hist) == 2
        assert db.get_latest_model_parameters("sabr", "SPY") is None

    def test_position_lifecycle(self, db):
        pid = db.open_position("SPY", "long", 100, 450.0, strategy="meanrev")
        db.update_position(pid, 455.0, unrealized_pnl=500.0)
        db.update_position(pid, 460.0, unrealized_pnl=1000.0)
        assert len(db.get_open_positions()) == 1
        db.close_position(pid, 458.0)
        assert db.get_open_positions() == []
        trail = db.get_position_history(pid)
        assert len(trail) == 2
        assert trail[-1]["unrealized_pnl"] == 1000.0

    def test_signals_and_options(self, db):
        db.store_signal("SPY", "vol_arb", "buy", 0.8, {"divergence": 0.15})
        sigs = db.query_signals("SPY")
        assert sigs[0]["payload"]["divergence"] == 0.15
        db.insert_option_quotes(
            [{"time": "2026-01-05T00:00:00", "underlying": "SPY", "strike": 450.0,
              "expiration": "2026-03-20", "option_type": "call", "bid": 5.0, "ask": 5.2}]
        )
        chain = db.query_option_chain("SPY")
        assert len(chain) == 1 and chain[0]["strike"] == 450.0

    def test_backup_and_restore_roundtrip(self, tmp_path):
        src = TimeSeriesDB(str(tmp_path / "live.db"))
        src.insert_market_prices(
            [{"time": "2026-01-01T00:00:00", "symbol": "SPY", "close": 123.0, "volume": 1.0}]
        )
        out = src.backup(str(tmp_path / "bk.db"))
        assert out["tables"] > 0

        # damage simulation: a fresh empty db restored from the backup
        dst = TimeSeriesDB(str(tmp_path / "recovered.db"))
        assert dst.query_market_prices("SPY") == []
        dst.restore(str(tmp_path / "bk.db"))
        rows = dst.query_market_prices("SPY")
        assert len(rows) == 1 and rows[0]["close"] == 123.0
        src.close()
        dst.close()

    @pytest.mark.slow
    def test_backup_restore_scripts(self, tmp_path):
        import subprocess

        live = tmp_path / "live.db"
        db = TimeSeriesDB(str(live))
        db.insert_market_prices(
            [{"time": "2026-01-01T00:00:00", "symbol": "QQQ", "close": 7.0, "volume": 1.0}]
        )
        db.close()
        bdir = tmp_path / "backups"
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [os.path.join(root, "deploy/scripts/backup.sh"), str(live), str(bdir)],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        backups = sorted(bdir.glob("pde_tpu_*.db.gz"))
        assert len(backups) == 1

        live.unlink()  # total loss
        r = subprocess.run(
            [os.path.join(root, "deploy/scripts/restore.sh"), str(backups[0]), str(live)],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        recovered = TimeSeriesDB(str(live))
        assert recovered.query_market_prices("QQQ")[0]["close"] == 7.0
        recovered.close()

    def test_health_check(self, db):
        h = db.health_check()
        assert h["healthy"] and h["latency_ms"] < 100


class TestIngestionAndRecovery:
    def test_pipeline_ingests(self):
        db = TimeSeriesDB(":memory:")
        pipe = DataIngestionPipeline(prov.SimulatedDataProvider(seed=2), db)
        res = pipe.ingest_symbol("SPY", date(2026, 1, 1), date(2026, 2, 1))
        assert res.status == IngestionStatus.SUCCESS
        assert res.n_stored > 0
        assert len(db.query_market_prices("SPY")) == res.n_stored

    def test_incremental_resumes(self):
        db = TimeSeriesDB(":memory:")
        pipe = DataIngestionPipeline(prov.SimulatedDataProvider(seed=2), db)
        inc = IncrementalIngestion(pipe)
        out1 = inc.ingest(["SPY"], end=date(2026, 2, 1), default_lookback_days=31)
        n1 = out1["SPY"].n_stored
        out2 = inc.ingest(["SPY"], end=date(2026, 2, 10))
        assert out2["SPY"].n_fetched <= 10
        assert len(db.query_market_prices("SPY")) >= n1

    def test_gap_detection_and_backfill(self):
        db = TimeSeriesDB(":memory:")
        cal = ref.TradingCalendar()
        # store bars for trading days, skipping a week
        days = cal.trading_days_between(date(2026, 3, 2), date(2026, 3, 31))
        kept = [d for d in days if not (date(2026, 3, 9) <= d <= date(2026, 3, 13))]
        db.insert_market_prices(
            [{"time": datetime.combine(d, datetime.min.time()).isoformat(),
              "symbol": "SPY", "close": 100.0} for d in kept]
        )
        det = rec.GapDetector(db, cal)
        gaps = det.detect("SPY", date(2026, 3, 2), date(2026, 3, 31))
        assert len(gaps) == 1
        assert gaps[0].start == date(2026, 3, 9) and gaps[0].end == date(2026, 3, 13)

        pipe = DataIngestionPipeline(prov.SimulatedDataProvider(seed=5), db)
        mgr = rec.BackfillManager(pipe)
        mgr.enqueue(gaps)
        stats = mgr.run()
        assert stats["completed"] == 1 and stats["pending"] == 0

    def test_reconciler(self):
        r = rec.DataReconciler(tolerance_pct=0.01)
        p1 = {date(2026, 1, d): 100.0 + d for d in range(1, 6)}
        p2 = dict(p1)
        p2[date(2026, 1, 3)] *= 1.05  # 5% discrepancy
        out = r.reconcile(p1, p2)
        assert out["n_mismatches"] == 1
        assert out["match_rate"] == pytest.approx(0.8)


class TestQualityMonitor:
    def test_symbol_staleness_levels(self):
        mon = DataQualityMonitor()
        now = datetime.now(timezone.utc)
        mon.record_update("FRESH", time=now)
        mon.record_update("STALE", time=now - timedelta(days=10))
        fresh = mon.check_symbol("FRESH", now=now)
        stale = mon.check_symbol("STALE", now=now)
        assert fresh[0].level == QualityLevel.GOOD
        assert stale[0].level == QualityLevel.BAD
        report = mon.report()
        assert report["overall"] == "bad"

    def test_provider_error_tracking(self):
        mon = DataQualityMonitor()
        for _ in range(5):
            mon.record_request("yahoo", ok=False, latency_ms=100)
        metrics = mon.check_provider("yahoo")
        assert metrics[0].level == QualityLevel.BAD  # 5 consecutive errors


class TestDataAPI:
    @pytest.fixture
    def client(self, event_loop=None):
        pytest.importorskip("aiohttp")
        return None

    def test_routes(self):
        """Drive the HTTP service in-process with aiohttp's test server."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from pde_tpu.data.api import DataService, create_data_api

        async def scenario():
            app = create_data_api(DataService())
            async with TestClient(TestServer(app)) as client:
                r = await client.get("/health")
                assert r.status == 200
                assert (await r.json())["status"] == "ok"

                r = await client.get("/quotes/SPY")
                body = await r.json()
                assert body["bid"] < body["ask"]

                r = await client.get("/bars/SPY?start=2026-01-01&end=2026-02-01")
                assert len((await r.json())["bars"]) == 31

                r = await client.post("/bars/batch", json={"symbols": ["SPY", "QQQ"],
                                                           "start": "2026-01-01",
                                                           "end": "2026-01-10"})
                body = await r.json()
                assert set(body) == {"SPY", "QQQ"}

                r = await client.get("/options/SPY")
                assert len((await r.json())["chain"]) == 18

                r = await client.get("/options/SPY/expirations")
                assert len((await r.json())["expirations"]) == 1

                r = await client.get("/calendar?start=2026-08-10&end=2026-08-14")
                assert len((await r.json())["trading_days"]) == 5

                r = await client.get("/metrics")
                assert r.status == 200
                assert "qt_" in (await r.text())

        asyncio.run(scenario())

    def test_request_validation_contracts(self):
        """Malformed input gets structured 4xx (reference data/api.py
        validates every route with pydantic): bad dates/symbols/bodies
        return 422 with FastAPI-shaped detail items, bad JSON returns 400,
        and none of them reach the provider as a 500/502."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from pde_tpu.data.api import DataService, create_data_api

        async def scenario():
            app = create_data_api(DataService())
            async with TestClient(TestServer(app)) as client:
                # malformed date
                r = await client.get("/bars/SPY?start=not-a-date")
                assert r.status == 422
                detail = (await r.json())["detail"]
                assert detail[0]["loc"] == ["query", "start"]

                # inverted range
                r = await client.get(
                    "/bars/SPY?start=2026-02-01&end=2026-01-01")
                assert r.status == 422

                # bad symbol characters
                r = await client.get("/quotes/SP%20Y;DROP")
                assert r.status == 422

                # batch body must be an object with non-empty symbols list
                r = await client.post("/bars/batch", json={"symbols": []})
                assert r.status == 422
                r = await client.post("/bars/batch", json=[1, 2])
                assert r.status == 422
                r = await client.post(
                    "/bars/batch", data=b"{not json",
                    headers={"Content-Type": "application/json"})
                assert r.status == 400

                # bad expiration date on the options route
                r = await client.get("/options/SPY?expiration=2026-13-40")
                assert r.status == 422

                # valid requests still flow after all the rejections
                r = await client.get("/bars/SPY?start=2026-01-01&end=2026-01-10")
                assert r.status == 200

        asyncio.run(scenario())


class TestReviewRegressions:
    def test_surface_builds_from_mixed_call_put_chain(self):
        """Every real chain carries calls AND puts at the same strikes; the
        spline build must collapse duplicates instead of crashing."""
        from pde_tpu.data.options import OptionQuote, OptionsChainProcessor
        from pde_tpu.data.providers import SimulatedDataProvider

        chain = SimulatedDataProvider().get_options_chain("SPY")
        quotes = [
            OptionQuote(strike=r["strike"], expiration=r["expiration"],
                        option_type=r["option_type"], bid=r["bid"],
                        ask=r["ask"], volume=r["volume"])
            for r in chain
        ]
        spot = float(np.median([r["strike"] for r in chain]))
        surf = OptionsChainProcessor().build_surface(quotes, spot_price=spot)
        assert len(surf._smiles) >= 1
        vol = surf.get_vol(spot, chain[0]["expiration"])
        assert vol == pytest.approx(0.22, abs=0.03)  # chain generated at 0.22

    def test_ingestion_keeps_warning_flagged_bars(self):
        """A legitimate crash day (WARNING outlier) must be stored, not
        silently deleted into a permanent gap."""
        from datetime import date

        from pde_tpu.data.ingestion import DataIngestionPipeline
        from pde_tpu.data.providers import SimulatedDataProvider
        from pde_tpu.database.db import TimeSeriesDB

        class CrashProvider(SimulatedDataProvider):
            def get_bars(self, symbol, start, end, interval="1d"):
                bars = super().get_bars(symbol, start, end, interval)
                mid = len(bars) // 2
                for b in bars[mid:]:          # -55% gap down, then continues
                    for f in ("open", "high", "low", "close"):
                        setattr(b, f, getattr(b, f) * 0.45)
                return bars

        db = TimeSeriesDB("sqlite://")
        pipe = DataIngestionPipeline(CrashProvider(), db)
        res = pipe.ingest_symbol("CRSH", date(2026, 1, 1), date(2026, 2, 1))
        rows = db.query_market_prices("CRSH", start="2026-01-01", end="2026-02-03")
        assert res.n_stored == len(rows) == 31  # nothing dropped

    def test_gap_detector_keeps_present_days_out_of_gaps(self):
        from datetime import date, datetime

        from pde_tpu.data.recovery import GapDetector

        class FakeDB:
            def query_market_prices(self, symbol, start=None, end=None):
                # present: Mon 8/10, Tue 8/11, THU 8/13 — missing Wed + Fri
                return [{"time": datetime(2026, 8, d).isoformat()}
                        for d in (10, 11, 13)]

        gaps = GapDetector(FakeDB()).detect("X", date(2026, 8, 10), date(2026, 8, 14))
        spans = [(g.start, g.end) for g in gaps]
        assert spans == [(date(2026, 8, 12), date(2026, 8, 12)),
                         (date(2026, 8, 14), date(2026, 8, 14))]

    def test_bar_end_time_is_bucket_boundary(self):
        from datetime import datetime, timedelta, timezone

        from pde_tpu.data.streaming import BarAggregator, StreamTrade

        agg = BarAggregator(bar_seconds=60.0)
        t0 = datetime(2026, 8, 17, 14, 30, tzinfo=timezone.utc)
        agg.add_trade(StreamTrade(symbol="X", price=10.0, size=1, time=t0))
        # next trade arrives 17 hours later: the finalized bar must still
        # end at its own bucket boundary, not the arrival wall-clock
        bar = agg.add_trade(StreamTrade(symbol="X", price=11.0, size=1,
                                        time=t0 + timedelta(hours=17)))
        assert bar is not None
        assert (bar.end_time - bar.start_time) == timedelta(seconds=60)

    def test_daily_record_counter_resets(self):
        from datetime import datetime, timezone

        from pde_tpu.data.monitoring import DataQualityMonitor

        mon = DataQualityMonitor()
        d1 = datetime(2026, 8, 17, 15, 0, tzinfo=timezone.utc)
        d2 = datetime(2026, 8, 18, 15, 0, tzinfo=timezone.utc)
        for _ in range(5):
            mon.record_update("SPY", time=d1)
        mon.record_update("SPY", time=d2)
        assert mon.symbols["SPY"].n_records_today == 1
