"""Optimizer + sector tests: signal families, grid search, rolling
re-optimization, confidence blending."""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.backtest import optimizer as opt
from pde_tpu.backtest import sectors
from pde_tpu.backtest.data_handler import SyntheticDataHandler


@pytest.fixture(scope="module")
def prices():
    return SyntheticDataHandler(["A"], n_bars=700, annual_vol=0.3, seed=17).prices["A"]


class TestSignalFamilies:
    def test_rsi_positions_react_to_extremes(self):
        # steadily falling then rising series
        p = np.concatenate([np.linspace(100, 70, 40), np.linspace(70, 110, 40)])
        pos = np.asarray(opt.rsi_positions(jnp.asarray(p), period=10))
        assert pos[35] == 1.0  # long after the slide (oversold)
        assert pos[-1] == -1.0  # short after the rally (overbought)

    def test_bollinger_mean_reversion(self):
        base = np.full(120, 100.0)
        base[60] = 90.0  # sharp drop pierces lower band
        pos = np.asarray(opt.bollinger_positions(jnp.asarray(base), window=20, n_std=2.0))
        assert pos[60] == 1.0
        assert pos[65] == 0.0  # back at the middle -> flat

    @pytest.mark.slow
    def test_all_families_produce_valid_positions(self, prices):
        p = jnp.asarray(prices)
        for name, spec in opt.STRATEGY_FAMILIES.items():
            params = {k: v[0] for k, v in spec["grid"].items()}
            pos = np.asarray(spec["fn"](p, **params))
            assert pos.shape == prices.shape, name
            assert set(np.unique(pos)).issubset({-1.0, 0.0, 1.0}), name


class TestStrategyOptimizer:
    @pytest.mark.slow
    def test_optimize_series_all_strategies(self, prices):
        o = opt.StrategyOptimizer()
        out = o.optimize_series(prices, group="test")
        assert set(out) == set(opt.STRATEGY_FAMILIES)
        for fr in out.values():
            assert np.isfinite(fr.fitness)
            assert fr.params  # chosen a grid point

    @pytest.mark.slow
    def test_run_optimization_with_cache(self, prices, tmp_path):
        # Cache round-trip semantics don't depend on series length: a short
        # window keeps the grid search cheap (the full-length fitness math is
        # covered by test_optimize_series_all_strategies in the slow tier).
        short = prices[:300]
        cache = tmp_path / "fits.json"
        o = opt.StrategyOptimizer(
            strategies={"ma_crossover": opt.STRATEGY_FAMILIES["ma_crossover"]},
            cache_path=str(cache),
        )
        groups = {"tech": {"A": short, "B": short[::-1].copy()}}
        res = o.run_optimization(groups)
        assert "tech" in res and "ma_crossover" in res["tech"]
        assert cache.exists()
        loaded = opt.StrategyOptimizer.load(cache)
        assert loaded["tech"]["ma_crossover"].params == res["tech"]["ma_crossover"].params

    @pytest.mark.slow
    def test_best_strategy_selection(self, prices):
        o = opt.StrategyOptimizer(
            strategies={
                k: opt.STRATEGY_FAMILIES[k] for k in ("momentum", "mean_reversion")
            }
        )
        res = o.run_optimization({"g": {"A": prices}})
        best = o.get_best_strategy(res, "g")
        assert best.fitness == max(f.fitness for f in res["g"].values())


class TestRollingOptimizer:
    def test_rolling_run(self, prices):
        o = opt.StrategyOptimizer(
            strategies={"ma_crossover": opt.STRATEGY_FAMILIES["ma_crossover"]}
        )
        rb = opt.RollingOptimizationBacktester(o, opt_window=252, trade_window=126)
        res = rb.run(prices)
        assert len(res.periods) >= 2
        assert res.oos_returns.size > 0
        assert "sharpe_ratio" in res.aggregate_metrics
        assert "Rolling backtest" in res.summary()
        # periods tile the series without overlap
        for a, b in zip(res.periods[:-1], res.periods[1:]):
            assert b.trade_start == a.trade_start + 126


class TestSectors:
    def test_sector_lookup(self):
        assert sectors.get_sector("AAPL") == sectors.Sector.TECHNOLOGY
        assert sectors.get_sector("jpm") == sectors.Sector.FINANCIALS
        assert sectors.get_sector("UNKNOWN") == sectors.Sector.ETF_INDEX

    def test_universe_helpers(self):
        all_stocks = sectors.get_all_stocks()
        assert "SPY" in all_stocks
        tech = sectors.get_stocks_by_sector(sectors.Sector.TECHNOLOGY)
        assert "NVDA" in tech

    def test_register_symbols(self):
        sectors.register_symbols(sectors.Sector.ENERGY, ["TESTOIL"])
        assert sectors.get_sector("TESTOIL") == sectors.Sector.ENERGY

    def test_confidence_weights(self):
        m = sectors.ConfidenceMetrics(
            symbol="X", sector=sectors.Sector.TECHNOLOGY,
            momentum_strength=1.0, mean_reversion_score=1.0,
            volatility_percentile=0.0, signal_strength=1.0,
            strategy_agreement=1.0, sector_algorithm_fitness=1.0,
        )
        assert m.calculate_confidence(use_fitness=True) == pytest.approx(1.0)
        m2 = sectors.ConfidenceMetrics(symbol="X", sector=sectors.Sector.TECHNOLOGY)
        # all-zero metrics with fitness=0.5 falls back to no-fitness weights
        assert m2.calculate_confidence() == pytest.approx(0.25 * 0.5 + 0.15 * 0.5)

    def test_vol_percentile_sees_latest_bar(self):
        """A volatility spike ON the latest bar must move the percentile
        (regression: the last rolling window excluded today's return, so
        'current vol' lagged one observation)."""
        rng = np.random.default_rng(2)
        calm = 100 * np.exp(np.cumsum(rng.normal(0, 0.002, 200)))
        spiked = calm.copy()
        spiked[-1] = calm[-2] * 1.30  # 30% single-day move
        calc = sectors.ConfidenceCalculator(vol_lookback=20)
        assert calc._vol_percentile(spiked) > calc._vol_percentile(calm)
        assert calc._vol_percentile(spiked) > 0.95  # spike window is the max

    def test_calculator_features(self, prices):
        calc = sectors.ConfidenceCalculator()
        m = calc.calculate("AAPL", prices, signal_strength=0.8, ou_half_life_days=20.0)
        assert -1.0 <= m.momentum_strength <= 1.0
        assert 0.0 <= m.trend_alignment <= 1.0
        assert 0.0 <= m.volatility_percentile <= 1.0
        assert 0.0 < m.confidence < 1.0
        assert m.mean_reversion_score == pytest.approx(1.0 - 15.0 / 55.0)

    def test_fitness_integration(self, prices):
        calc = sectors.ConfidenceCalculator()
        calc.set_optimization_results({sectors.Sector.TECHNOLOGY: 0.9})
        m = calc.calculate("AAPL", prices)
        assert m.sector_algorithm_fitness == 0.9

    def test_position_size(self):
        assert sectors.calculate_position_size(0.8, 1e6, 0.1) == pytest.approx(80_000)
        assert sectors.calculate_position_size(0.1, 1e6) == 0.0
