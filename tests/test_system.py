"""Top-level tests: config layering, TradingSystem pipeline, CLI subcommands."""

import json
import os

import numpy as np
import pytest

from pde_tpu.cli import main as cli_main
from pde_tpu.core.config import Config, load_config
from pde_tpu.trading_system import TradingSystem, create_trading_system


class TestConfig:
    def test_defaults(self):
        cfg = Config()
        assert cfg.trading.initial_capital == 100_000.0
        assert cfg.model.sabr_beta == 0.5
        assert cfg.compute.de_popsize == 15

    def test_file_round_trip(self, tmp_path):
        cfg = Config()
        cfg.trading.initial_capital = 5e6
        cfg.model.heston_kappa_bounds = (0.5, 5.0)
        path = str(tmp_path / "cfg.json")
        cfg.save(path)
        loaded = Config.from_file(path)
        assert loaded.trading.initial_capital == 5e6
        assert loaded.model.heston_kappa_bounds == (0.5, 5.0)

    def test_yaml_round_trip(self, tmp_path):
        cfg = Config()
        cfg.env = "production"
        path = str(tmp_path / "cfg.yaml")
        cfg.save(path)
        assert Config.from_file(path).env == "production"

    def test_env_overrides(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PDE_INITIAL_CAPITAL", "250000")
        monkeypatch.setenv("PDE_ENV", "staging")
        monkeypatch.setenv("PDE_DEBUG", "true")
        cfg = load_config()
        assert cfg.trading.initial_capital == 250_000.0
        assert cfg.env == "staging"
        assert cfg.debug

    def test_precedence_file_then_env(self, tmp_path, monkeypatch):
        path = str(tmp_path / "cfg.json")
        c = Config()
        c.trading.initial_capital = 111.0
        c.save(path)
        monkeypatch.setenv("PDE_INITIAL_CAPITAL", "222")
        assert load_config(path).trading.initial_capital == 222.0

    def test_sqlite_path(self):
        c = Config()
        c.database.url = "sqlite:///x.db"
        assert c.database.sqlite_path == "x.db"
        c.database.url = "sqlite://"
        assert c.database.sqlite_path == ":memory:"


class TestTradingSystem:
    @pytest.fixture
    def system(self):
        cfg = Config()
        cfg.database.url = "sqlite://"
        s = TradingSystem(cfg)
        status = s.initialize()
        assert all(status.values()), f"degraded init: {status}"
        return s

    def test_initialize_all_components(self, system):
        for name in ("db", "heston_calibrator", "orchestrator", "risk_manager",
                     "broker", "order_manager", "kill_switch"):
            assert system.component(name) is not None

    def test_signal_to_fill_pipeline(self, system, rng):
        from pde_tpu.signals.aggregator import AggregatedSignal, AggregatedSignalType

        sig = AggregatedSignal(
            asset="SPY", signal_type=AggregatedSignalType.BUY, confidence=0.9,
            supporting_strategies=["vol_arbitrage"], conflicting_strategies=[],
            rationale="test",
        )
        rets = rng.normal(0.0005, 0.01, 100)
        out = system.process_signal(sig, current_price=450.0, return_series=rets)
        assert out["status"] == "filled"
        assert system.component("broker").get_positions()["SPY"] > 0

    def test_low_confidence_skipped(self, system):
        from pde_tpu.signals.aggregator import AggregatedSignal, AggregatedSignalType

        sig = AggregatedSignal("SPY", AggregatedSignalType.BUY, 0.3, [], [], "weak")
        out = system.process_signal(sig, 450.0)
        assert out["status"] == "skipped"

    def test_halt_blocks_pipeline(self, system):
        from pde_tpu.signals.aggregator import AggregatedSignal, AggregatedSignalType

        system.halt_trading("test halt")
        sig = AggregatedSignal("SPY", AggregatedSignalType.BUY, 0.9, [], [], "x")
        out = system.process_signal(sig, 450.0)
        assert out["status"] == "halted"

    def test_backtest_wrapper(self, system):
        from pde_tpu.backtest.data_handler import SyntheticDataHandler

        prices = SyntheticDataHandler(["SPY"], n_bars=300, seed=4).prices
        res = system.run_backtest(prices, strategy="momentum", lookback=30, holding_period=10)
        assert res.n_bars == 300
        with pytest.raises(ValueError):
            system.run_backtest(prices, strategy="nope")

    @pytest.mark.slow
    def test_monte_carlo_wrapper(self, system, rng):
        res = system.run_monte_carlo(rng.normal(0.0005, 0.01, 300), n_simulations=100)
        assert res.n_simulations == 100

    def test_status_and_shutdown(self, system):
        st = system.get_status()
        assert st["initialized"] and "components" in st
        system.shutdown()
        assert not system.running

    def test_factory(self):
        s = create_trading_system()
        assert s.initialized
        s.shutdown()


class TestCLI:
    def test_backtest_command(self, capsys):
        rc = cli_main(["backtest", "--symbols", "SPY", "--days", "200", "--json"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "sharpe" in out
        last = out.strip().splitlines()[-1]
        payload = json.loads(last)
        assert "total_return_pct" in payload

    def test_calibrate_command(self, capsys):
        rc = cli_main(["calibrate", "--n-strikes", "7", "--n-maturities", "2",
                       "--maxiter", "30", "--popsize", "8"])
        assert rc == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["success"]
        assert "kappa" in payload["params"]

    def test_status_and_config_commands(self, capsys, tmp_path):
        assert cli_main(["status"]) == 0
        assert "components" in capsys.readouterr().out
        save = str(tmp_path / "out.json")
        assert cli_main(["config", "--save", save]) == 0
        assert json.loads(open(save).read())["trading"]["initial_capital"] == 100000.0

    def test_scan_command(self, capsys):
        rc = cli_main(["scan", "--symbols", "AAA", "BBB", "--days", "300"])
        assert rc == 0
        rows = json.loads(capsys.readouterr().out)
        assert {r["symbol"] for r in rows} == {"AAA", "BBB"}
        assert all("half_life_days" in r for r in rows)

    def test_sector_portfolio_command(self, capsys):
        rc = cli_main(["sector-portfolio", "--symbols", "AAPL", "XOM", "--days", "200"])
        assert rc == 0
        rows = json.loads(capsys.readouterr().out)
        assert rows[0]["sector"] in ("technology", "energy")

    @pytest.mark.slow
    def test_rolling_backtest_command(self, capsys):
        rc = cli_main(["rolling-backtest", "--symbol", "SPY", "--days", "320",
                       "--opt-window", "150", "--trade-window", "80",
                       "--strategies", "momentum"])
        assert rc == 0
        assert "Rolling backtest" in capsys.readouterr().out

    @pytest.mark.slow
    def test_optimize_sectors_command(self, capsys, tmp_path):
        cache = str(tmp_path / "fits.json")
        rc = cli_main(["optimize-sectors", "--symbols", "AAPL", "--days", "300",
                       "--cache", cache])
        assert rc == 0
        assert os.path.exists(cache)

    def test_varswap_command(self, capsys):
        rc = cli_main(["varswap", "--maturities", "0.25", "1.0",
                       "--lam", "0.6", "--mu-j", "-0.08", "--sigma-j", "0.18"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["model"] == "bates"
        rows = out["strikes"]
        assert len(rows) == 2
        for row in rows:
            # Jensen: exact vol strike strictly below sqrt(variance strike)
            assert 0 < row["volatility_strike_exact"] < np.sqrt(
                row["variance_strike"])
            assert row["convexity_discount_vol_points"] > 0
        assert "forward_variance" in out
        # pure-diffusion default drops the jump loading
        rc = cli_main(["varswap", "--maturities", "0.25"])
        assert rc == 0
        heston_out = json.loads(capsys.readouterr().out)
        assert heston_out["model"] == "heston"
        assert (heston_out["strikes"][0]["variance_strike"]
                < rows[0]["variance_strike"])

    def test_fwdstart_command(self, capsys):
        rc = cli_main(["fwdstart", "--rel-strikes", "0.9", "1.0", "1.1",
                       "--fixing", "0.5", "--maturity", "1.0",
                       "--cliquet-periods", "4"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        rows = out["forward_starts"]
        assert len(rows) == 3
        # forward-start calls decrease in relative strike
        assert rows[0]["price"] > rows[1]["price"] > rows[2]["price"] > 0
        # a 0..8% capped 4-period strip is worth less than 4 * 8% but > 0
        assert 0 < out["cliquet_strip"]["price"] < 0.32

    def test_pide_command(self, capsys):
        rc = cli_main(["pide", "--jumps", "merton", "--oracle-check",
                       "--strikes", "90", "100", "110",
                       "--n-space", "256", "--n-time", "64"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        rows = out["rows"]
        assert [r["strike"] for r in rows] == [90.0, 100.0, 110.0]
        assert rows[0]["price"] > rows[1]["price"] > rows[2]["price"] > 0
        assert out["oracle_max_abs_err"] < 0.05
        # american kou put: price floored at intrinsic
        rc = cli_main(["pide", "--jumps", "kou", "--put", "--american",
                       "--strikes", "120", "--n-space", "256",
                       "--n-time", "64"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["rows"][0]["price"] >= 20.0

    def test_vix_command(self, capsys):
        rc = cli_main(["vix", "--maturities", "0.25", "0.5",
                       "--strikes", "18", "22", "26", "--rate", "0.03"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["model"] == "heston"
        assert 10.0 < out["spot_vix"] < 40.0
        assert len(out["futures"]) == 2
        assert all(f["price"] > 0 for f in out["futures"])
        # options block uses the first maturity only (documented in --strikes)
        opts = out["options"]
        assert opts["maturity"] == 0.25
        rows = opts["rows"]
        assert [r["strike"] for r in rows] == [18.0, 22.0, 26.0]
        # calls decrease in strike; Black-76 IVs positive
        assert rows[0]["price"] > rows[1]["price"] > rows[2]["price"] > 0
        assert all(r["black76_iv"] > 0 for r in rows)
        # Bates route: jump strip premium raises spot VIX
        rc = cli_main(["vix", "--lam", "0.5", "--maturities", "0.25"])
        assert rc == 0
        out2 = json.loads(capsys.readouterr().out)
        assert out2["model"] == "bates"
        assert out2["spot_vix"] > out["spot_vix"]

    def test_rates_command(self, capsys):
        rc = cli_main(["rates", "--caplet-starts", "1.0", "2.0",
                       "--swaption-expiries", "1.0", "--swap-tenor", "2.0"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["model"] == "hull-white"
        caps = out["atm_caplets"]
        assert len(caps) == 2 and all(c["price"] > 0 for c in caps)
        sw = out["atm_swaptions"][0]
        assert sw["payer_price"] > 0 and 0.0 < sw["par_rate"] < 0.10
        # curve pillars echo the resolved discount factors
        assert all(0 < row["df"] <= 1 for row in out["curve"])
        # mismatched curve arrays -> clean error exit
        rc = cli_main(["rates", "--curve-times", "1.0",
                       "--curve-zeros", "0.03", "0.04"])
        assert rc == 2

    def test_credit_command(self, capsys):
        rc = cli_main(["credit", "--pillars", "1.0", "3.0",
                       "--spreads", "0.008", "0.011", "--cva-tenor", "2.0"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        rows = out["pillars"]
        assert len(rows) == 2
        assert all(r["hazard"] > 0 and 0 < r["survival"] < 1 for r in rows)
        # hazards roughly s/(1-R)
        assert rows[0]["hazard"] == pytest.approx(0.008 / 0.6, rel=0.15)
        assert out["cva_atm_payer_swap"]["cva"] > 0
        # mismatched pillar arrays -> clean error exit
        rc = cli_main(["credit", "--pillars", "1.0",
                       "--spreads", "0.01", "0.02"])
        assert rc == 2

    def test_rates_command_bermudan(self, capsys):
        rc = cli_main(["rates", "--bermudan", "--swaption-expiries", "1.0",
                       "--swap-tenor", "2.0", "--caplet-starts", "1.0"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        bm = out["atm_bermudan"]
        # Bermudan dominates its European, premium is the difference
        assert bm["payer_price"] >= bm["european_price"] - 1e-6
        assert bm["early_exercise_premium"] == pytest.approx(
            bm["payer_price"] - bm["european_price"], abs=1e-12)

    def test_rates_command_cap_vol_strip(self, capsys):
        """--cap-vols drives the full quote-to-calibration path: strip
        forward caplet vols, price the strip, refit (a, sigma)."""
        rc = cli_main(["rates", "--cap-vols", "0.25", "0.22",
                       "--cap-maturities", "1.0", "2.0",
                       "--caplet-starts", "1.0",
                       "--swaption-expiries", "1.0"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        strip = out["cap_vol_strip"]
        vols = [row["vol"] for row in strip["forward_vols"]]
        assert len(vols) == 7  # quarterly resets 0.25..1.75
        assert vols[0] == pytest.approx(0.25, rel=1e-6)  # first cap flat
        assert vols[-1] < vols[0]  # declining quotes -> declining forwards
        assert all(row["price"] > 0 for row in strip["forward_vols"])
        assert strip["fitted"]["converged"]
        assert strip["fitted"]["sigma"] > 0

    def test_price_command_cf(self, capsys):
        rc = cli_main(["price", "--method", "cf", "--strikes", "90", "100", "110"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        p = out["prices"]
        assert p[0] > p[1] > p[2] > 0  # calls decrease in strike
        assert all(0.1 < iv < 0.5 for iv in out["implied_vols"])

    def test_price_command_pde_american_put(self, capsys):
        rc = cli_main(["price", "--method", "pde", "--put", "--american",
                       "--strikes", "100", "--spot", "90", "--rate", "0.08",
                       "--dividend", "0"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["american"] and out["prices"][0] >= 10.0  # >= intrinsic

    def test_price_command_digital(self, capsys):
        rc = cli_main(["price", "--method", "digital",
                       "--strikes", "90", "100", "110"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        cash, asset = out["cash"], out["asset"]
        # digitals decrease in strike; probabilities in (0,1), P1 > P2
        assert cash[0] > cash[1] > cash[2] > 0
        assert asset[0] > asset[1] > asset[2] > 0
        assert all(0 < p2 < p1 < 1 for p1, p2 in zip(out["p1"], out["p2"]))

    @pytest.mark.slow
    def test_price_command_greeks(self, capsys):
        rc = cli_main(["price", "--method", "greeks", "--strikes", "100"])
        assert rc == 0
        row = json.loads(capsys.readouterr().out)["greeks"][0]
        assert 0.3 < row["delta"] < 0.9 and row["d_v0"] > 0

    def test_demo_command(self, capsys):
        rc = cli_main(["demo"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "calibrating Heston" in out and "backtest" in out


class TestLiveLoop:
    def test_ticks_to_orders_critical_path(self):
        """Stream -> bars -> multi-strategy vote -> risk-gated orders; the
        reference's <5 s critical-path target (design-doc.md:357) holds with
        huge margin."""
        from pde_tpu.core.config import Config
        from pde_tpu.data.streaming import SimulatedStreamProvider

        cfg = Config()
        cfg.database.url = "sqlite://"
        system = TradingSystem(cfg)
        system.initialize()

        provider = SimulatedStreamProvider(seed=9, vol_per_tick=5e-3,
                                           base_prices={"SPY": 450.0})
        # bar per tick so signals fire quickly
        stats = system.run_live(provider, ["SPY"], n_ticks=150, bar_seconds=1e-9,
                                signal_every_bars=2, lookback=60)
        assert stats["bars"]["SPY"] >= 140
        assert stats["worst_signal_to_order_s"] < 5.0
        assert stats["orders_submitted"] >= 0  # may be zero if no vote trips
        system.shutdown()

    def test_dataframe_calibration_input(self):
        """The reference's primary input type (pandas DataFrame) works."""
        import pandas as pd

        from pde_tpu.calibrate import HestonCalibrator

        data = HestonCalibrator.generate_synthetic_data(
            n_strikes=7, n_maturities=2, as_dataframe=True
        )
        assert isinstance(data, pd.DataFrame)
        cal = HestonCalibrator(global_maxiter=20, global_popsize=6)
        res = cal.calibrate(data, S0=100.0, r=0.05, q=0.02)
        assert res.fit_quality["rmse"] < 1.0
        # the generator drops sub-penny deep-OTM quotes (see
        # generate_synthetic_data), so 7x2 yields slightly under 14
        assert 10 <= res.fit_quality["n_options"] <= 14


class TestExitSemantics:
    def test_exit_signal_closes_short(self):
        """EXIT while short must BUY back the held quantity, not add to the
        short (review regression)."""
        from types import SimpleNamespace

        from pde_tpu.core.config import Config

        cfg = Config()
        cfg.database.url = "sqlite://"
        system = TradingSystem(cfg)
        system.initialize()
        broker = system._components["broker"]
        broker.set_price("SPY", 100.0)

        short = SimpleNamespace(asset="SPY", signal_type="sell", confidence=0.9,
                                supporting_strategies=["t"])
        out = system.process_signal(short, 100.0)
        held = broker.get_positions().get("SPY", 0.0)
        assert held < 0

        exit_sig = SimpleNamespace(asset="SPY", signal_type="exit",
                                   confidence=0.9, supporting_strategies=["t"])
        out = system.process_signal(exit_sig, 100.0)
        assert out["side"].lower() == "buy"
        assert broker.get_positions().get("SPY", 0.0) == 0.0

    def test_exit_without_position_skips(self):
        from types import SimpleNamespace

        from pde_tpu.core.config import Config

        cfg = Config()
        cfg.database.url = "sqlite://"
        system = TradingSystem(cfg)
        system.initialize()
        sig = SimpleNamespace(asset="QQQ", signal_type="exit", confidence=0.9,
                              supporting_strategies=[])
        out = system.process_signal(sig, 300.0)
        assert out["status"] == "skipped"
