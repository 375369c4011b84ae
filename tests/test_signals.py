"""Signal layer tests: vol-arb filters/confidence, mean-reversion state
machine, aggregator voting."""

from datetime import datetime, timezone

import numpy as np
import pytest

from pde_tpu.calibrate.heston import HestonCalibrator
from pde_tpu.calibrate.ou import OptimalBoundaries, OUFitResult, OUFitter
from pde_tpu.models.heston import HestonParams
from pde_tpu.models.ou import OUParams
from pde_tpu.signals.aggregator import (
    AggregatedSignalType,
    AggregatorConfig,
    SignalAggregator,
)
from pde_tpu.signals.mean_reversion import (
    MeanReversionConfig,
    MeanReversionSignalGenerator,
    MeanRevSignalType,
    Position,
)
from pde_tpu.signals.vol_arbitrage import (
    SignalType,
    VolArbitrageConfig,
    VolArbitrageSignal,
    VolSurfaceArbitrageSignal,
)


def make_heston_result(rmse=0.01):
    from pde_tpu.calibrate.heston import CalibrationResult

    return CalibrationResult(
        params=HestonParams(2.0, 0.04, 0.3, -0.7, 0.04),
        fit_quality={"rmse": rmse},
        convergence={"local_converged": True},
        timestamp=datetime.now(timezone.utc),
    )


def make_ou_result(theta=0.0, mu=10.0, sigma=0.2):
    params = OUParams(theta=theta, mu=mu, sigma=sigma)
    boundaries = OUFitter().compute_optimal_boundaries(params)
    return OUFitResult(
        params=params,
        boundaries=boundaries,
        log_likelihood=0.0,
        aic=0.0,
        bic=0.0,
        n_observations=500,
        fit_time=0.0,
        success=True,
        message="ok",
    )


class TestVolArbitrage:
    def chain(self, market_iv):
        n = len(market_iv)
        return {
            "underlying": ["TEST"] * n,
            "strike": np.linspace(90, 110, n),
            "T": np.full(n, 60 / 365),  # in the preferred maturity window
            "implied_vol": np.asarray(market_iv),
            "option_type": ["call"] * n,
        }

    def test_buy_signal_when_market_cheap(self):
        """Market IV far below model IV -> BUY."""
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        hr = make_heston_result()
        # model ATM IV ~19%; market at 13% is ~45% divergence
        chain = self.chain([0.13] * 5)
        signals = gen.generate_signals(chain, S0=100.0, r=0.05, q=0.02, heston_result=hr)
        assert signals, "expected at least one signal"
        assert all(s.signal_type == SignalType.BUY for s in signals)
        assert all(s.divergence_pct > 0.10 for s in signals)

    def test_sell_signal_when_market_rich(self):
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        hr = make_heston_result()
        chain = self.chain([0.26] * 5)
        signals = gen.generate_signals(chain, S0=100.0, r=0.05, q=0.02, heston_result=hr)
        assert signals
        assert all(s.signal_type == SignalType.SELL for s in signals)

    def test_no_signal_within_threshold(self):
        """Market priced exactly at the model smile -> zero divergence."""
        import jax.numpy as jnp
        from pde_tpu.models import heston as hm

        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        hr = make_heston_result()
        strikes = np.linspace(90, 110, 5)
        model_smile = np.asarray(
            hm.implied_volatility(
                hr.params, jnp.asarray(strikes), jnp.full(5, 60 / 365),
                100.0, 0.05, 0.02, accurate=True,
            )
        )
        chain = self.chain(model_smile)
        assert gen.generate_signals(chain, S0=100.0, r=0.05, q=0.02, heston_result=hr) == []

    def test_extreme_divergence_filtered(self):
        """>50% divergence treated as data error (reference behavior)."""
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        hr = make_heston_result()
        chain = self.chain([0.05] * 5)  # ~280% divergence
        assert gen.generate_signals(chain, S0=100.0, r=0.05, q=0.02, heston_result=hr) == []

    def test_maturity_filter(self):
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        hr = make_heston_result()
        chain = self.chain([0.13] * 5)
        chain["T"] = np.full(5, 2 / 365)  # 2 days to expiry < min 7
        assert gen.generate_signals(chain, S0=100.0, r=0.05, q=0.02, heston_result=hr) == []

    def test_volume_and_spread_filters(self):
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        hr = make_heston_result()
        chain = self.chain([0.13] * 4)
        chain["volume"] = np.array([500, 10, 500, 500])  # second fails volume
        chain["bid"] = np.array([5.0, 5.0, 5.0, 4.0])
        chain["ask"] = np.array([5.1, 5.1, 5.1, 6.0])  # fourth fails spread
        signals = gen.generate_signals(chain, S0=100.0, r=0.05, q=0.02, heston_result=hr)
        strikes = {s.strike for s in signals}
        k = np.linspace(90, 110, 4)
        assert k[1] not in strikes
        assert k[3] not in strikes

    def test_requires_a_model(self):
        gen = VolSurfaceArbitrageSignal()
        with pytest.raises(ValueError):
            gen.generate_signals(self.chain([0.2]), S0=100.0, r=0.05, q=0.02)

    def test_filter_signals_orders_by_confidence(self):
        mk = lambda c: VolArbitrageSignal(
            underlying="X", strike=100.0, expiration=None, option_type="call",
            signal_type=SignalType.BUY, confidence=c, model_iv=0.2, market_iv=0.15,
            divergence_pct=0.3, rationale="",
        )
        gen = VolSurfaceArbitrageSignal()
        out = gen.filter_signals([mk(0.6), mk(0.9), mk(0.7)], top_n=2)
        assert [s.confidence for s in out] == [0.9, 0.7]


class TestMeanReversion:
    def test_entry_long_below_boundary(self):
        gen = MeanReversionSignalGenerator()
        res = make_ou_result()
        lo = res.boundaries.entry_lower
        sig = gen.generate_signal("A-B", lo - 0.05, res)
        assert sig is not None and sig.signal_type == MeanRevSignalType.ENTRY_LONG
        assert sig.confidence >= 0.6
        assert sig.exit_target == 0.0

    def test_entry_short_above_boundary(self):
        gen = MeanReversionSignalGenerator()
        res = make_ou_result()
        sig = gen.generate_signal("A-B", res.boundaries.entry_upper + 0.05, res)
        assert sig.signal_type == MeanRevSignalType.ENTRY_SHORT

    def test_no_entry_inside_boundaries(self):
        gen = MeanReversionSignalGenerator()
        res = make_ou_result()
        assert gen.generate_signal("A-B", 0.0, res) is None

    def test_half_life_gates(self):
        gen = MeanReversionSignalGenerator()
        fast = make_ou_result(mu=80.0)  # half-life ~2 days < min 5
        assert gen.generate_signal("A-B", -1.0, fast) is None
        slow = make_ou_result(mu=0.8)  # half-life ~218 days > max 120
        assert gen.generate_signal("A-B", -1.0, slow) is None

    def test_exit_take_profit_and_stop_loss_priority(self):
        gen = MeanReversionSignalGenerator()
        res = make_ou_result()
        pos = Position(
            spread_name="A-B", direction="long", entry_price=-0.1,
            entry_time=datetime.now(timezone.utc), quantity=1.0,
            stop_loss=-0.2, take_profit=0.0,
        )
        tp = gen.generate_signal("A-B", 0.01, res, current_position=pos)
        assert tp.signal_type == MeanRevSignalType.EXIT_TAKE_PROFIT
        assert tp.pnl > 0
        sl = gen.generate_signal("A-B", -0.25, res, current_position=pos)
        assert sl.signal_type == MeanRevSignalType.EXIT_STOP_LOSS
        assert sl.confidence == 1.0

    def test_position_registry(self):
        gen = MeanReversionSignalGenerator()
        pos = Position("A-B", "long", -0.1, datetime.now(timezone.utc), 1.0, -0.2, 0.0)
        gen.register_position(pos)
        assert gen.get_position("A-B") is pos
        assert gen.close_position("A-B") is pos
        assert gen.get_position("A-B") is None

    def test_confidence_scales_with_distance(self):
        gen = MeanReversionSignalGenerator()
        res = make_ou_result()
        lo = res.boundaries.entry_lower
        near = gen.generate_signal("A-B", lo - 0.01, res)
        far = gen.generate_signal("A-B", lo - 0.08, res)
        assert far.confidence > near.confidence


class TestAggregator:
    def vol_sig(self, asset="SPY", direction=SignalType.BUY, confidence=0.8):
        return VolArbitrageSignal(
            underlying=asset, strike=100.0, expiration=None, option_type="call",
            signal_type=direction, confidence=confidence, model_iv=0.22,
            market_iv=0.18, divergence_pct=0.22, rationale="model rich",
        )

    def mr_sig(self, asset="SPY", stype=MeanRevSignalType.ENTRY_LONG, confidence=0.75):
        from pde_tpu.signals.mean_reversion import MeanReversionSignal

        return MeanReversionSignal(
            spread_name=asset, signal_type=stype, confidence=confidence,
            current_value=0.0, rationale="spread wide",
        )

    def test_single_signal_passthrough(self):
        agg = SignalAggregator()
        out = agg.aggregate(vol_arbitrage_signals=[self.vol_sig()])
        assert len(out) == 1
        assert out[0].signal_type == AggregatedSignalType.BUY
        assert out[0].suggested_position_size > 0

    def test_agreeing_signals_combine(self):
        agg = SignalAggregator()
        out = agg.aggregate(
            vol_arbitrage_signals=[self.vol_sig(confidence=0.8)],
            mean_reversion_signals=[self.mr_sig(confidence=0.7)],
        )
        assert len(out) == 1
        assert set(out[0].supporting_strategies) == {"vol_arbitrage", "mean_reversion"}

    def test_conflict_without_consensus_drops(self):
        agg = SignalAggregator()
        out = agg.aggregate(
            vol_arbitrage_signals=[self.vol_sig(direction=SignalType.SELL, confidence=0.7)],
            mean_reversion_signals=[self.mr_sig(confidence=0.7)],
        )
        assert out == []  # equal weights, no 1.5x dominance

    def test_conflict_with_dominance_resolves(self):
        agg = SignalAggregator()
        out = agg.aggregate(
            vol_arbitrage_signals=[self.vol_sig(direction=SignalType.SELL, confidence=0.95)],
            mean_reversion_signals=[self.mr_sig(confidence=0.3)],
        )
        # 0.95 > 0.3 * 1.5 -> SELL wins; confidence = 0.95/1.25 = 0.76
        assert len(out) == 1
        assert out[0].signal_type == AggregatedSignalType.SELL
        assert out[0].conflicting_strategies == ["mean_reversion"]

    def test_exit_priority_with_position(self):
        agg = SignalAggregator()
        out = agg.aggregate(
            vol_arbitrage_signals=[self.vol_sig(confidence=0.9)],
            mean_reversion_signals=[
                self.mr_sig(stype=MeanRevSignalType.EXIT_STOP_LOSS, confidence=1.0)
            ],
            current_positions={"SPY": {"direction": "long"}},
        )
        assert len(out) == 1
        assert out[0].signal_type == AggregatedSignalType.EXIT

    def test_risk_budget_filter(self):
        agg = SignalAggregator(AggregatorConfig(max_strategy_allocation_pct=0.15))
        sigs = agg.aggregate(
            vol_arbitrage_signals=[
                self.vol_sig(asset=a, confidence=c)
                for a, c in [("A", 0.9), ("B", 0.8), ("C", 0.7)]
            ],
            portfolio_value=1_000_000,
        )
        kept = agg.filter_by_risk_budget(sigs, portfolio_value=1_000_000)
        total = sum(s.suggested_position_size for s in kept)
        assert total <= 0.15 * 1_000_000 + 1e-6
        assert len(kept) < len(sigs)


class TestVolArbitrageRough:
    def chain(self, market_iv, T=60 / 365):
        n = len(market_iv)
        return {
            "underlying": ["TEST"] * n,
            "strike": np.linspace(90, 110, n),
            "T": np.full(n, T),
            "implied_vol": np.asarray(market_iv),
            "option_type": ["call"] * n,
        }

    def _rough_result(self, rmse=0.005):
        from pde_tpu.calibrate.rough import RoughCalibrationResult
        from pde_tpu.models.rough_heston import RoughHestonParams

        return RoughCalibrationResult(
            params=RoughHestonParams(0.15, 2.0, 0.04, 0.3, -0.7, 0.04),
            rmse=rmse, converged=True, n_iter=10,
        )

    def test_rough_model_wins_when_supplied(self):
        """rough_result present => model IVs come from the rough smile;
        a cheap market yields BUY signals with the rough fit's rmse in the
        confidence path."""
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        signals = gen.generate_signals(
            self.chain([0.13] * 5), S0=100.0, r=0.05, q=0.02,
            rough_result=self._rough_result(),
        )
        assert signals
        assert all(s.signal_type == SignalType.BUY for s in signals)

    def test_rough_iv_differs_from_heston_iv_short_maturity(self):
        """At short maturity the rough (H=0.15) model IVs must differ from
        classic Heston's — that difference IS the reason to wire it in."""
        gen = VolSurfaceArbitrageSignal(use_sabr=False)
        chain = self.chain([0.2] * 5, T=0.05)
        strikes = np.asarray(chain["strike"], float)
        T = np.asarray(chain["T"], float)
        is_call = np.ones(5, bool)
        hr = make_heston_result()
        iv_heston = gen._model_iv_vector(
            strikes, T, is_call, 100.0, 0.05, 0.02, hr, None)
        iv_rough = gen._model_iv_vector(
            strikes, T, is_call, 100.0, 0.05, 0.02, hr, None,
            self._rough_result())
        assert np.all(np.isfinite(iv_rough))
        assert np.max(np.abs(iv_rough - iv_heston)) > 0.003

    def test_use_rough_false_ignores_rough_result(self):
        gen = VolSurfaceArbitrageSignal(use_sabr=False, use_rough=False)
        chain = self.chain([0.2] * 5)
        strikes = np.asarray(chain["strike"], float)
        T = np.asarray(chain["T"], float)
        is_call = np.ones(5, bool)
        hr = make_heston_result()
        iv_plain = gen._model_iv_vector(
            strikes, T, is_call, 100.0, 0.05, 0.02, hr, None)
        iv_with = gen._model_iv_vector(
            strikes, T, is_call, 100.0, 0.05, 0.02, hr, None,
            self._rough_result())
        np.testing.assert_allclose(iv_with, iv_plain, rtol=0, atol=0)
