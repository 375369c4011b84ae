"""Black-Scholes closed forms and vectorized IV tests."""

import jax
import numpy as np
import pytest

from pde_tpu.models import black_scholes as bs


class TestPrice:
    def test_known_value(self):
        """Classic textbook value: S=100, K=100, r=5%, q=0, T=1, vol=20%."""
        c = float(bs.price(100.0, 100.0, 0.05, 0.0, 1.0, 0.2, True))
        assert abs(c - 10.450583572185565) < 1e-10

    def test_put_call_parity(self):
        c = float(bs.price(100.0, 105.0, 0.05, 0.02, 0.5, 0.25, True))
        p = float(bs.price(100.0, 105.0, 0.05, 0.02, 0.5, 0.25, False))
        expected = 100.0 * np.exp(-0.01) - 105.0 * np.exp(-0.025)
        assert abs((c - p) - expected) < 1e-12

    def test_zero_maturity_intrinsic(self):
        assert float(bs.price(100.0, 90.0, 0.05, 0.0, 0.0, 0.2, True)) == 10.0
        assert float(bs.price(100.0, 110.0, 0.05, 0.0, 0.0, 0.2, False)) == 10.0

    def test_vectorized(self):
        strikes = np.linspace(80, 120, 50)
        prices = np.asarray(bs.price(100.0, strikes, 0.05, 0.02, 1.0, 0.2, True))
        assert prices.shape == (50,)
        assert np.all(np.diff(prices) < 0)


class TestGreeks:
    def test_vega_positive_and_symmetric_peak(self):
        v = float(bs.vega(100.0, 100.0, 0.05, 0.0, 1.0, 0.2))
        assert v > 0
        assert v > float(bs.vega(100.0, 150.0, 0.05, 0.0, 1.0, 0.2))

    def test_delta_bounds(self):
        d_call = float(bs.delta(100.0, 100.0, 0.05, 0.0, 1.0, 0.2, True))
        d_put = float(bs.delta(100.0, 100.0, 0.05, 0.0, 1.0, 0.2, False))
        assert 0 < d_call < 1
        assert -1 < d_put < 0
        assert abs((d_call - d_put) - 1.0) < 1e-12  # no dividend: C_delta - P_delta = 1

    def test_greeks_match_ad(self):
        """Closed-form Greeks agree with autodiff of the price."""
        args = (100.0, 95.0, 0.03, 0.01, 0.75, 0.3)

        d_spot = float(jax.grad(lambda s: bs.price(s, *args[1:], True).sum())(args[0]))
        assert abs(d_spot - float(bs.delta(*args, True))) < 1e-8

        d_vol = float(jax.grad(lambda v: bs.price(*args[:5], v, True).sum())(args[5]))
        assert abs(d_vol - float(bs.vega(*args))) < 1e-8

        d_rate = float(
            jax.grad(lambda r: bs.price(args[0], args[1], r, *args[3:], True).sum())(args[2])
        )
        assert abs(d_rate - float(bs.rho(*args, True))) < 1e-8


class TestImpliedVol:
    def test_round_trip(self):
        vols = np.array([0.1, 0.2, 0.35, 0.6])
        strikes = np.array([90.0, 100.0, 105.0, 120.0])
        prices = bs.price(100.0, strikes, 0.05, 0.02, 1.0, vols, True)
        iv = bs.implied_vol(prices, 100.0, strikes, 0.05, 0.02, 1.0, True)
        np.testing.assert_allclose(np.asarray(iv), vols, atol=1e-7)

    def test_put_round_trip(self):
        p = bs.price(100.0, 110.0, 0.05, 0.0, 0.5, 0.25, False)
        iv = bs.implied_vol(p, 100.0, 110.0, 0.05, 0.0, 0.5, False)
        assert abs(float(iv) - 0.25) < 1e-7

    def test_custom_init(self):
        p = bs.price(100.0, 100.0, 0.05, 0.0, 1.0, 0.2, True)
        iv = bs.implied_vol(p, 100.0, 100.0, 0.05, 0.0, 1.0, True, init_vol=0.5)
        assert abs(float(iv) - 0.2) < 1e-7

    def test_zero_maturity_returns_zero(self):
        iv = bs.implied_vol(5.0, 100.0, 95.0, 0.05, 0.0, 0.0, True)
        assert float(iv) == 0.0
