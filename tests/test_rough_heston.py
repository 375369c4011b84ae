"""Rough Heston (models/rough_heston.py): fractional Riccati CF + pricing.

The strongest oracle is the alpha = 1 (H = 1/2) limit, where the fractional
Riccati equation IS the classic Heston Riccati ODE — the rough CF and
prices must collapse onto models/heston (itself golden-tested against the
compiled reference, src/cpp/models/heston.cpp).  On top of that: the exact
CF identities (phi(0) = 1, martingale phi(-i) = 1), Adams self-convergence,
and the model's raison d'etre — the short-maturity skew that steepens as
the Hurst exponent falls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import heston
from pde_tpu.models.rough_heston import (
    RoughHestonParams,
    cf_reduced_rough,
    implied_vol_rough,
    price_rough,
)

CLASSIC = heston.HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)
ROUGH_H12 = RoughHestonParams(hurst=0.5, lam=2.0, theta=0.04, nu=0.3, rho=-0.7, v0=0.04)
ROUGH = RoughHestonParams(hurst=0.1, lam=2.0, theta=0.04, nu=0.3, rho=-0.7, v0=0.04)


class TestClassicLimit:
    def test_cf_matches_heston_at_h_half(self):
        """alpha = 1: the Adams solution of the fractional Riccati equation
        must reproduce the closed-form Heston CF (exp(C + D v0)) on the
        damped Carr-Madan argument line."""
        u = jnp.linspace(0.1, 60.0, 13) - 1j * 1.75
        cf_r = np.asarray(cf_reduced_rough(ROUGH_H12, u, 1.0, n_steps=512))
        cf_h = np.asarray(
            heston._cf_reduced(
                CLASSIC, u.astype(jnp.complex128), jnp.asarray(1.0),
                jnp.float64, jnp.complex128,
            )
        )
        assert np.max(np.abs(cf_r - cf_h) / np.abs(cf_h)) < 5e-4

    def test_prices_match_converged_heston_at_h_half(self):
        strikes = jnp.array([85.0, 95.0, 100.0, 105.0, 115.0])
        for T in (0.1, 1.0):
            p_r = price_rough(ROUGH_H12, strikes, T, 100.0, 0.05, 0.02,
                              n_steps=512)
            p_h = heston.price_accurate(
                CLASSIC, strikes, jnp.full(5, T), 100.0, 0.05, 0.02)
            np.testing.assert_allclose(
                np.asarray(p_r), np.asarray(p_h), atol=5e-5)


class TestCFIdentities:
    def test_phi_zero_is_one(self):
        cf = cf_reduced_rough(ROUGH, jnp.array([0.0 + 0.0j]), 1.0)
        assert complex(cf[0]) == pytest.approx(1.0 + 0.0j, abs=1e-12)

    def test_martingale_phi_minus_i_is_one(self):
        """phi(-i) = E[S_T]/F = 1: F(-i, 0) = 0, so h stays identically 0
        and the scheme must preserve that exactly."""
        cf = cf_reduced_rough(ROUGH, jnp.array([-1j]), 1.0)
        assert complex(cf[0]) == pytest.approx(1.0 + 0.0j, abs=1e-12)

    def test_cf_modulus_bounded(self):
        """|phi(u)| <= 1 on the real line (a characteristic function)."""
        u = jnp.linspace(0.1, 80.0, 40).astype(jnp.complex128)
        cf = cf_reduced_rough(ROUGH, u, 0.5)
        assert float(jnp.max(jnp.abs(cf))) <= 1.0 + 1e-10

    def test_adams_self_convergence(self):
        """Halving the step must shrink the CF change (scheme converges)."""
        u = jnp.linspace(0.5, 40.0, 7) - 1j * 1.75
        c96 = cf_reduced_rough(ROUGH, u, 1.0, n_steps=96)
        c192 = cf_reduced_rough(ROUGH, u, 1.0, n_steps=192)
        c384 = cf_reduced_rough(ROUGH, u, 1.0, n_steps=384)
        e_coarse = float(jnp.max(jnp.abs(c96 - c384)))
        e_fine = float(jnp.max(jnp.abs(c192 - c384)))
        assert e_fine < e_coarse
        assert e_fine < 5e-4


class TestRoughSmile:
    def test_skew_steepens_as_hurst_falls(self):
        """The point of the model: at short maturity, lower H => steeper
        negative-correlation skew (downside wing above upside wing)."""
        strikes = jnp.array([95.0, 105.0])
        skews = []
        for H in (0.1, 0.3, 0.5):
            rp = RoughHestonParams(H, 2.0, 0.04, 0.3, -0.7, 0.04)
            iv = implied_vol_rough(rp, strikes, 0.05, 100.0)
            skews.append(float(iv[0] - iv[1]))
        assert skews[0] > skews[1] > skews[2] > 0.0

    def test_skew_explodes_at_short_maturity_only_when_rough(self):
        """skew ~ T^{H-1/2}: for H = 0.1 the skew must grow sharply as T
        falls; at H = 0.5 (classic) it stays ~flat."""
        strikes = jnp.array([97.0, 103.0])

        def skew(params, T):
            iv = implied_vol_rough(params, strikes, T, 100.0)
            return float(iv[0] - iv[1]) / (jnp.log(103.0) - jnp.log(97.0))

        rough_ratio = skew(ROUGH, 0.02) / skew(ROUGH, 0.5)
        classic_ratio = skew(ROUGH_H12, 0.02) / skew(ROUGH_H12, 0.5)
        assert rough_ratio > 2.0 * classic_ratio

    def test_put_call_parity(self):
        strikes = jnp.array([95.0, 100.0, 105.0])
        T, S0, r, q = 0.5, 100.0, 0.05, 0.02
        calls = price_rough(ROUGH, strikes, T, S0, r, q, is_call=True)
        puts = price_rough(ROUGH, strikes, T, S0, r, q, is_call=False)
        parity = S0 * np.exp(-q * T) - np.asarray(strikes) * np.exp(-r * T)
        np.testing.assert_allclose(
            np.asarray(calls - puts), parity, atol=1e-8)

    def test_price_monotone_in_strike(self):
        strikes = jnp.linspace(80.0, 120.0, 9)
        calls = price_rough(ROUGH, strikes, 0.25, 100.0, 0.03, 0.0)
        assert bool(jnp.all(jnp.diff(calls) < 0))


class TestValidation:
    def test_validate_rejects_bad_hurst(self):
        with pytest.raises(ValueError, match="hurst"):
            RoughHestonParams(0.7, 2.0, 0.04, 0.3, -0.7, 0.04).validate()
        with pytest.raises(ValueError, match="hurst"):
            RoughHestonParams(0.0, 2.0, 0.04, 0.3, -0.7, 0.04).validate()

    def test_validate_rejects_bad_rho(self):
        with pytest.raises(ValueError, match="rho"):
            RoughHestonParams(0.3, 2.0, 0.04, 0.3, -1.5, 0.04).validate()

    def test_validate_accepts_good(self):
        ROUGH.validate()


class TestRoughCalibration:
    def test_synthetic_surface_shapes(self):
        from pde_tpu.calibrate.rough import RoughHestonCalibrator

        data = RoughHestonCalibrator.generate_synthetic_surface(
            maturities=(0.1, 0.5), n_steps=32,
        )
        assert data["strikes"].shape == data["mid_prices"].shape == (2, 9)
        assert np.all(data["mid_prices"] > 0)

    def test_input_validation(self):
        from pde_tpu.calibrate.rough import RoughHestonCalibrator

        cal = RoughHestonCalibrator()
        with pytest.raises(ValueError, match="n_mat"):
            cal.calibrate(np.ones(5), np.array([0.5]), np.ones(5), 100.0)
        with pytest.raises(ValueError, match="maturities"):
            cal.calibrate(np.ones((2, 5)), np.array([0.5]),
                          np.ones((2, 5)), 100.0)

    @pytest.mark.slow
    def test_parameter_recovery_including_hurst(self):
        """Full 6-parameter fit (H, lam, theta, nu, rho, v0) on a 3-maturity
        synthetic surface recovers the generator to ~1e-6 — the rough analog
        of the classic calibrator's recovery test."""
        from pde_tpu.calibrate.rough import RoughHestonCalibrator

        data = RoughHestonCalibrator.generate_synthetic_surface(n_steps=96)
        cal = RoughHestonCalibrator(n_steps=96, max_iter=40)
        res = cal.calibrate(
            data["strikes"], data["maturities"], data["mid_prices"],
            data["S0"], data["r"], data["q"],
        )
        true = data["true_params"]
        assert res.converged
        assert res.rmse < 1e-8
        for name in RoughHestonParams._fields:
            assert getattr(res.params, name) == pytest.approx(
                getattr(true, name), abs=1e-4), name
