"""Backtesting tests: portfolio accounting, execution costs, the event loop
end-to-end, vectorized fast path, walk-forward and Monte-Carlo
(cf. tests/python/backtesting/test_backtesting.py)."""

import queue
from datetime import datetime

import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.backtest import analysis, vectorized
from pde_tpu.backtest.data_handler import ArrayDataHandler, SyntheticDataHandler
from pde_tpu.backtest.engine import BacktestEngine
from pde_tpu.backtest.events import (
    Direction,
    FillEvent,
    MarketEvent,
    OrderEvent,
    OrderType,
    SignalEvent,
    SignalType,
)
from pde_tpu.backtest.execution import (
    IBKRCommission,
    InstantExecutionHandler,
    PerShareCommission,
    SimulatedExecutionHandler,
    ZeroCommission,
)
from pde_tpu.backtest.portfolio import Portfolio
from pde_tpu.backtest.strategy import (
    BuyAndHoldStrategy,
    MeanReversionStrategy,
    MovingAverageCrossStrategy,
    MomentumStrategy,
)

TS = datetime(2022, 1, 3)


def fill(symbol, direction, qty, price, commission=0.0):
    return FillEvent(
        event_type=None, timestamp=TS, symbol=symbol, direction=direction,
        quantity=qty, fill_price=price, commission=commission,
    )


class TestPortfolio:
    def test_buy_then_sell_realizes_pnl(self):
        p = Portfolio(initial_capital=100_000)
        p.current_prices["X"] = 100.0
        p.update_fill(fill("X", Direction.BUY, 100, 100.0))
        assert p.cash == 100_000 - 10_000
        assert p.get_position("X") == 100
        p.update_fill(fill("X", Direction.SELL, 100, 110.0))
        assert p.get_position("X") == 0
        assert p.realized_pnl == pytest.approx(1000.0)
        assert p.cash == pytest.approx(101_000.0)

    def test_average_cost_basis(self):
        p = Portfolio()
        p.update_fill(fill("X", Direction.BUY, 100, 100.0))
        p.update_fill(fill("X", Direction.BUY, 100, 110.0))
        assert p.positions["X"].avg_price == pytest.approx(105.0)
        p.update_fill(fill("X", Direction.SELL, 200, 120.0))
        assert p.realized_pnl == pytest.approx(200 * 15.0)

    def test_short_cover(self):
        p = Portfolio()
        p.update_fill(fill("X", Direction.SELL, 50, 100.0))
        assert p.get_position("X") == -50
        p.update_fill(fill("X", Direction.BUY, 50, 90.0))
        assert p.realized_pnl == pytest.approx(500.0)
        assert p.get_position("X") == 0

    def test_flip_long_to_short(self):
        p = Portfolio()
        p.update_fill(fill("X", Direction.BUY, 100, 100.0))
        p.update_fill(fill("X", Direction.SELL, 150, 105.0))
        assert p.get_position("X") == -50
        assert p.realized_pnl == pytest.approx(500.0)
        assert p.positions["X"].avg_price == 105.0

    def test_commission_reduces_pnl(self):
        p = Portfolio()
        p.update_fill(fill("X", Direction.BUY, 10, 100.0, commission=5.0))
        assert p.realized_pnl == -5.0

    def test_equity_and_exposure(self):
        p = Portfolio(initial_capital=10_000)
        p.update_fill(fill("X", Direction.BUY, 50, 100.0))
        ev = MarketEvent(event_type=None, timestamp=TS, symbol="X", price=110.0)
        p.update_market_data(ev)
        assert p.equity == pytest.approx(5000 + 50 * 110.0)
        assert p.unrealized_pnl == pytest.approx(500.0)
        assert p.gross_exposure == pytest.approx(5500.0)

    def test_order_generation_respects_state(self):
        p = Portfolio(initial_capital=100_000, max_position_pct=0.1)
        p.current_prices["X"] = 100.0
        sig = SignalEvent(event_type=None, timestamp=TS, symbol="X", signal_type=SignalType.LONG)
        order = p.generate_order(sig)
        assert order.direction == Direction.BUY
        assert order.quantity == pytest.approx(100.0)  # 10% of 100k / 100
        # already long: another LONG produces nothing
        p.update_fill(fill("X", Direction.BUY, 100, 100.0))
        assert p.generate_order(sig) is None
        # EXIT closes
        exit_sig = SignalEvent(event_type=None, timestamp=TS, symbol="X", signal_type=SignalType.EXIT)
        order = p.generate_order(exit_sig)
        assert order.direction == Direction.SELL and order.quantity == 100.0

    def test_shorting_disabled(self):
        p = Portfolio(allow_shorting=False)
        p.current_prices["X"] = 50.0
        sig = SignalEvent(event_type=None, timestamp=TS, symbol="X", signal_type=SignalType.SHORT)
        assert p.generate_order(sig) is None


class TestExecution:
    def test_commissions(self):
        assert ZeroCommission().calculate(1000, 50.0) == 0.0
        assert PerShareCommission(0.005, 1.0).calculate(1000, 50.0) == 5.0
        assert PerShareCommission(0.005, 1.0).calculate(10, 50.0) == 1.0
        # IBKR: min 1, max 1% of value
        assert IBKRCommission().calculate(100, 100.0) == pytest.approx(1.0)
        assert IBKRCommission().calculate(100000, 0.10) == pytest.approx(100.0)

    def test_tiered_commission_resets_on_simulated_month_boundary(self):
        from datetime import datetime

        from pde_tpu.backtest.execution import TieredCommission

        tiers = [(1000, 0.01), (float("inf"), 0.001)]
        tc = TieredCommission(tiers=tiers, minimum=0.0)
        h = SimulatedExecutionHandler(tc, slippage_pct=0.0, market_impact_coeff=0.0)
        h.current_prices["X"] = 100.0

        def fill(ts, qty=800):
            return h.execute_order(OrderEvent(event_type=None, timestamp=ts, symbol="X",
                                              direction=Direction.BUY, quantity=qty))

        jan1 = fill(datetime(2026, 1, 5))
        assert jan1.commission == pytest.approx(800 * 0.01)   # tier 1 (vol 0)
        fill(datetime(2026, 1, 12))                            # vol 800 -> still tier 1
        jan3 = fill(datetime(2026, 1, 20))
        assert jan3.commission == pytest.approx(800 * 0.001)  # vol 1600: tier 2
        # SIMULATED month boundary (order timestamp, not wall clock) resets
        # the running volume back to tier 1
        feb = fill(datetime(2026, 2, 2))
        assert feb.commission == pytest.approx(800 * 0.01)

    def test_slippage_direction(self):
        h = SimulatedExecutionHandler(ZeroCommission(), slippage_pct=0.001, market_impact_coeff=0.0)
        h.current_prices["X"] = 100.0
        buy = h.execute_order(OrderEvent(event_type=None, timestamp=TS, symbol="X",
                                         direction=Direction.BUY, quantity=10))
        sell = h.execute_order(OrderEvent(event_type=None, timestamp=TS, symbol="X",
                                          direction=Direction.SELL, quantity=10))
        assert buy.fill_price > 100.0 > sell.fill_price

    def test_limit_order_rests_until_marketable(self):
        h = SimulatedExecutionHandler(ZeroCommission(), slippage_pct=0.0, market_impact_coeff=0.0)
        h.current_prices["X"] = 100.0
        order = OrderEvent(event_type=None, timestamp=TS, symbol="X",
                           order_type=OrderType.LIMIT, direction=Direction.BUY,
                           quantity=10, limit_price=95.0)
        assert h.execute_order(order) is None
        assert len(h.pending_orders) == 1
        h.current_prices["X"] = 94.0
        fills = h.process_pending()
        assert len(fills) == 1 and fills[0].fill_price == pytest.approx(94.0)

    def test_limit_fill_never_crosses_limit(self):
        """Slippage/impact cannot push a marketable limit fill through the
        limit price (regression: BUY LIMIT 100 at market 99.99 used to fill
        at ~100.04)."""
        h = SimulatedExecutionHandler(ZeroCommission(), slippage_pct=0.0005,
                                      market_impact_coeff=0.1)
        h.current_prices["X"] = 99.99
        f = h.execute_order(OrderEvent(event_type=None, timestamp=TS, symbol="X",
                                       order_type=OrderType.LIMIT,
                                       direction=Direction.BUY,
                                       quantity=10_000, limit_price=100.0))
        assert f is not None and f.fill_price <= 100.0
        s = h.execute_order(OrderEvent(event_type=None, timestamp=TS, symbol="X",
                                       order_type=OrderType.LIMIT,
                                       direction=Direction.SELL,
                                       quantity=10_000, limit_price=99.98))
        assert s is not None and s.fill_price >= 99.98

    def test_stop_limit_arms_then_respects_limit(self):
        """STOP_LIMIT: no fill before the stop triggers; once armed it
        becomes a resting limit (regression: it used to fall through both
        branches and fill instantly as a market order)."""
        from datetime import datetime

        from pde_tpu.backtest.events import MarketEvent

        h = SimulatedExecutionHandler(ZeroCommission(), slippage_pct=0.0,
                                      market_impact_coeff=0.0)
        h.update_market_data(MarketEvent(event_type=None, timestamp=TS,
                                         symbol="X", price=100.0))
        # protective sell: trigger at 90, limit 89
        order = OrderEvent(event_type=None, timestamp=TS, symbol="X",
                           order_type=OrderType.STOP_LIMIT,
                           direction=Direction.SELL, quantity=10,
                           stop_price=90.0, limit_price=89.0)
        assert h.execute_order(order) is None        # market at 100: rests
        t2 = datetime(2026, 3, 2)
        h.update_market_data(MarketEvent(event_type=None, timestamp=t2,
                                         symbol="X", price=89.5))
        fills = h.process_pending()                   # stop hit, limit ok
        assert len(fills) == 1
        assert fills[0].fill_price >= 89.0            # limit leg protects
        # fill stamped with the TRIGGERING bar, not the submission bar
        assert fills[0].timestamp == t2

    def test_stop_limit_gap_through_limit_keeps_resting(self):
        """A gap through BOTH stop and limit arms the order but must not
        fill beyond the limit — it rests as a limit order."""
        from pde_tpu.backtest.events import MarketEvent

        h = SimulatedExecutionHandler(ZeroCommission(), slippage_pct=0.0,
                                      market_impact_coeff=0.0)
        h.update_market_data(MarketEvent(event_type=None, timestamp=TS,
                                         symbol="X", price=100.0))
        order = OrderEvent(event_type=None, timestamp=TS, symbol="X",
                           order_type=OrderType.STOP_LIMIT,
                           direction=Direction.SELL, quantity=10,
                           stop_price=90.0, limit_price=89.0)
        h.execute_order(order)
        h.current_prices["X"] = 80.0                  # gap through the limit
        assert h.process_pending() == []              # armed but not filled
        assert h.pending_orders[0].order_type == OrderType.LIMIT
        h.current_prices["X"] = 92.0                  # recovers above limit
        fills = h.process_pending()
        assert len(fills) == 1 and fills[0].fill_price >= 89.0

    def test_instant_handler_frictionless(self):
        h = InstantExecutionHandler()
        h.current_prices["X"] = 42.0
        f = h.execute_order(OrderEvent(event_type=None, timestamp=TS, symbol="X",
                                       direction=Direction.BUY, quantity=5))
        assert f.fill_price == 42.0 and f.commission == 0.0


class TestEngineEndToEnd:
    def test_buy_and_hold_tracks_market(self):
        data = SyntheticDataHandler(["SPY"], n_bars=252, annual_drift=0.10, annual_vol=0.15, seed=3)
        engine = BacktestEngine(
            data_handler=data,
            strategy=BuyAndHoldStrategy(["SPY"]),
            portfolio=Portfolio(initial_capital=100_000, max_position_pct=1.0),
            execution_handler=InstantExecutionHandler(),
        )
        res = engine.run()
        market_total = data.prices["SPY"][-1] / data.prices["SPY"][1] - 1.0
        # fully invested from bar 2: returns track the asset closely
        assert res.final_equity > 0
        assert abs(res.total_return_pct / 100 - market_total) < 0.05
        assert res.n_bars == 252

    def test_ma_cross_strategy_produces_trades(self):
        data = SyntheticDataHandler(["A"], n_bars=400, annual_vol=0.35, seed=9)
        engine = BacktestEngine(
            data_handler=data,
            strategy=MovingAverageCrossStrategy(["A"], 10, 40),
            portfolio=Portfolio(initial_capital=100_000),
            execution_handler=SimulatedExecutionHandler(),
        )
        res = engine.run()
        assert res.n_trades > 0
        assert res.total_commission > 0
        assert np.isfinite(res.sharpe_ratio)
        assert res.max_drawdown_pct >= 0

    def test_mean_reversion_and_momentum_run(self):
        for strat in (
            MeanReversionStrategy(["A"], lookback=15),
            MomentumStrategy(["A"], lookback=30, holding_period=10),
        ):
            data = SyntheticDataHandler(["A"], n_bars=300, seed=5)
            engine = BacktestEngine(
                data_handler=data, strategy=strat,
                portfolio=Portfolio(), execution_handler=InstantExecutionHandler(),
            )
            res = engine.run()
            assert res.n_bars == 300

    def test_results_summary_renders(self):
        data = SyntheticDataHandler(["A"], n_bars=100, seed=1)
        engine = BacktestEngine(data, BuyAndHoldStrategy(["A"]), Portfolio(), InstantExecutionHandler())
        res = engine.run()
        s = res.summary()
        assert "sharpe" in s and "trades" in s


class TestVectorized:
    def test_equity_from_positions_math(self):
        prices = jnp.array([100.0, 110.0, 99.0, 108.9])
        pos = jnp.array([1.0, 1.0, 0.0, 0.0])
        ret, eq = vectorized.equity_from_positions(prices, pos, cost_per_turnover=0.0)
        np.testing.assert_allclose(np.asarray(ret), [0.10, -0.10, 0.0], atol=1e-12)
        assert float(eq[-1]) == pytest.approx(0.99)

    def test_costs_charged_on_turnover(self):
        prices = jnp.array([100.0, 100.0, 100.0])
        pos = jnp.array([1.0, -1.0, 0.0])
        ret, _ = vectorized.equity_from_positions(prices, pos, cost_per_turnover=0.001)
        # t0: enter (|1|), t1: flip (|2|)
        np.testing.assert_allclose(np.asarray(ret), [-0.001, -0.002], atol=1e-12)

    def test_vectorized_matches_event_driven_ma(self):
        """The jnp MA-cross position series equals the event-driven one."""
        data = SyntheticDataHandler(["A"], n_bars=300, annual_vol=0.3, seed=13)
        prices = data.prices["A"]
        vec = np.asarray(vectorized.ma_cross_positions(jnp.asarray(prices), 10, 40))
        ref = MovingAverageCrossStrategy.signal_array(prices, 10, 40)
        np.testing.assert_allclose(vec[45:], ref[45:], atol=1e-9)

    def test_zscore_positions_state_machine(self):
        data = SyntheticDataHandler(["A"], n_bars=250, seed=21)
        prices = data.prices["A"]
        vec = np.asarray(vectorized.zscore_positions(jnp.asarray(prices), 20, 2.0, 0.5))
        ref = MeanReversionStrategy.signal_array(prices, 20, 2.0, 0.5)
        np.testing.assert_allclose(vec, ref, atol=1e-9)

    def test_grid_backtest_one_launch(self):
        data = SyntheticDataHandler(["A"], n_bars=500, annual_vol=0.3, seed=2)
        shorts = np.array([5, 10, 20, 5, 10])
        longs = np.array([50, 50, 60, 30, 100])
        out = vectorized.grid_backtest_ma(jnp.asarray(data.prices["A"]), shorts, longs)
        assert out["sharpe"].shape == (5,)
        assert np.all(np.isfinite(np.asarray(out["sharpe"])))


class TestAnalysis:
    @pytest.mark.slow
    def test_walk_forward(self):
        data = SyntheticDataHandler(["A"], n_bars=800, annual_vol=0.3, seed=4)
        wf = analysis.WalkForwardAnalysis(
            signal_fn=lambda p, short, long: vectorized.ma_cross_positions(
                jnp.asarray(p), short, long
            ),
            param_grid={"short": [5, 10], "long": [40, 60]},
            is_window=252,
            oos_window=126,
        )
        res = wf.run(data.prices["A"])
        assert len(res.windows) >= 3
        assert res.oos_returns.size > 0
        assert all(w.best_params["short"] in (5, 10) for w in res.windows)
        assert np.isfinite(res.sharpe_decay)

    @pytest.mark.slow
    def test_anchored_mode_grows_is(self):
        data = SyntheticDataHandler(["A"], n_bars=600, seed=6)
        wf = analysis.WalkForwardAnalysis(
            signal_fn=lambda p, w: vectorized.momentum_positions(jnp.asarray(p), w, 10),
            param_grid={"w": [20, 40]},
            is_window=200, oos_window=100, anchored=True,
        )
        res = wf.run(data.prices["A"])
        assert all(w.is_start == 0 for w in res.windows)

    @pytest.mark.parametrize("method", ["shuffle", "block", "parametric"])
    @pytest.mark.slow
    def test_monte_carlo_methods(self, method, rng):
        rets = rng.normal(0.0005, 0.01, 500)
        mc = analysis.MonteCarloSimulator(n_simulations=200, method=method, seed=1)
        res = mc.run(rets)
        assert res.n_simulations == 200
        assert 0.0 <= res.prob_loss <= 1.0
        assert res.final_equity_percentiles["p5"] < res.final_equity_percentiles["p95"]
        # mean final equity near the realized compounded value
        realized = np.prod(1 + rets)
        assert abs(res.final_equity_mean - realized) / realized < 0.25

    def test_monte_carlo_bad_method(self):
        with pytest.raises(ValueError):
            analysis.MonteCarloSimulator(method="nope").run(np.zeros(10))

    @pytest.mark.slow
    def test_parameter_sensitivity(self):
        data = SyntheticDataHandler(["A"], n_bars=400, seed=8)
        out = analysis.parameter_sensitivity(
            signal_fn=lambda p, lookback: vectorized.momentum_positions(jnp.asarray(p), lookback, 10),
            prices=data.prices["A"],
            base_params={"lookback": 40},
            param_ranges={"lookback": [20, 40, 60]},
        )
        assert len(out["lookback"]) == 3
