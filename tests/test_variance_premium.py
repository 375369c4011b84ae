"""Variance-risk-premium signal tests: strip-implied vs forecast variance."""

import jax.numpy as jnp
import numpy as np

from pde_tpu.models import heston
from pde_tpu.models.heston import HestonParams
from pde_tpu.signals.variance_premium import (
    VariancePremiumConfig,
    VariancePremiumSignal,
    VariancePremiumStrategy,
    VarianceSignalType,
)

S0, R, Q, T = 100.0, 0.03, 0.0, 0.25


def _chain(params, n=400, k_lo=0.4, k_hi=2.5):
    F = S0 * np.exp((R - Q) * T)
    K = np.linspace(k_lo * F, k_hi * F, n)
    ic = K > F
    prices = np.asarray(heston.price_accurate(
        params, jnp.asarray(K), T, S0, R, Q, is_call=jnp.asarray(ic)))
    return K, prices, F


def _returns(ann_vol, n=500, seed=0):
    rng = np.random.default_rng(seed)
    return ann_vol / np.sqrt(252.0) * rng.standard_normal(n)


HIGH_VOL = HestonParams(2.0, 0.09, 0.3, -0.6, 0.09)   # ~30-vol surface
LOW_VOL = HestonParams(2.0, 0.022, 0.2, -0.6, 0.022)  # ~15-vol surface


class TestVRPSignal:
    def test_rich_implied_sells_variance(self):
        """30-vol implied chain vs ~18-vol realized returns => SELL."""
        K, P, F = _chain(HIGH_VOL)
        strat = VariancePremiumStrategy()
        sig = strat.evaluate_chain("SPX", K, P, F, T, R,
                                   returns=_returns(0.18))
        assert sig is not None
        assert sig.signal_type == VarianceSignalType.SELL_VARIANCE
        assert sig.vrp > 0.015
        assert 0.0 < sig.confidence <= 1.0
        assert abs(sig.implied_vol - 0.30) < 0.03

    def test_cheap_implied_buys_variance(self):
        """15-vol implied chain vs ~25-vol realized returns => BUY."""
        K, P, F = _chain(LOW_VOL)
        strat = VariancePremiumStrategy()
        sig = strat.evaluate_chain("SPX", K, P, F, T, R,
                                   returns=_returns(0.25, seed=3))
        assert sig is not None
        assert sig.signal_type == VarianceSignalType.BUY_VARIANCE
        assert sig.vrp < -0.005

    def test_neutral_zone_is_silent(self):
        """Implied ~ expected: inside the thresholds, no signal."""
        K, P, F = _chain(HIGH_VOL)
        strat = VariancePremiumStrategy()
        sig = strat.evaluate_chain("SPX", K, P, F, T, R,
                                   returns=_returns(0.295, seed=5))
        assert sig is None

    def test_model_forecast_path(self):
        """Calibrated-params forecast (fair_variance_strike) instead of the
        statistical estimator: a chain priced by the SAME params has VRP ~ 0
        => silent; priced by richer params => SELL."""
        strat = VariancePremiumStrategy()
        K, P, F = _chain(HIGH_VOL)
        assert strat.evaluate_chain("SPX", K, P, F, T, R,
                                    model_params=HIGH_VOL) is None
        sig = strat.evaluate_chain("SPX", K, P, F, T, R,
                                   model_params=LOW_VOL)
        assert sig is not None
        assert sig.signal_type == VarianceSignalType.SELL_VARIANCE

    def test_thin_or_narrow_chains_filtered(self):
        strat = VariancePremiumStrategy()
        K, P, F = _chain(HIGH_VOL, n=5)
        assert strat.evaluate_chain("X", K, P, F, T, R,
                                    returns=_returns(0.18)) is None
        K, P, F = _chain(HIGH_VOL, n=50, k_lo=0.85, k_hi=1.15)
        assert strat.evaluate_chain("X", K, P, F, T, R,
                                    returns=_returns(0.18)) is None

    def test_surface_and_serialization(self):
        K, P, F = _chain(HIGH_VOL)
        chains = [dict(strike=K, otm_price=P, forward=F, maturity=T, rate=R)]
        strat = VariancePremiumStrategy()
        sigs = strat.evaluate_surface("SPX", chains, returns=_returns(0.18))
        assert len(sigs) == 1
        d = sigs[0].to_dict()
        assert d["signal_type"] == "sell_variance"
        assert set(d) >= {"underlying", "maturity", "vrp", "confidence",
                          "implied_variance", "expected_variance", "rationale"}
        assert isinstance(sigs[0], VariancePremiumSignal)

    def test_wider_dislocation_raises_confidence(self):
        K, P, F = _chain(HIGH_VOL)
        strat = VariancePremiumStrategy(VariancePremiumConfig())
        weak = strat.evaluate_chain("SPX", K, P, F, T, R,
                                    returns=_returns(0.22, seed=7))
        strong = strat.evaluate_chain("SPX", K, P, F, T, R,
                                      returns=_returns(0.12, seed=7))
        assert weak is not None and strong is not None
        assert strong.confidence > weak.confidence
