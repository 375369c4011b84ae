"""Volatility-derivative tests: variance/vol swaps + VIX-style strips.

Validation strategy is triangular cross-checking, no golden values needed:
the CIR Laplace transform's AD derivatives at s=0 must reproduce the
closed-form variance-swap strike; the exact vol-swap quadrature must obey
Jensen and collapse to sqrt(E[I]) when variance is deterministic; and the
model-free strip on a CF-priced dense chain must reproduce the closed form
(exactly for Heston, with the known Demeterfi/Broadie-Jain jump bias for
Bates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import heston, varswap
from pde_tpu.models.bates import BatesParams
from pde_tpu.models.heston import HestonParams

HP = HestonParams(kappa=2.0, theta=0.04, sigma=0.4, rho=-0.7, v0=0.06)
BP = BatesParams(kappa=2.0, theta=0.04, sigma=0.4, rho=-0.7, v0=0.06,
                 lam=0.8, mu_j=-0.08, sigma_j=0.18)


class TestLaplaceTransform:
    def test_at_zero_is_one(self):
        for p in (HP, BP):
            val = float(varswap.integrated_variance_laplace(p, 0.0, 0.75))
            np.testing.assert_allclose(val, 1.0, rtol=1e-12)

    def test_monotone_decreasing_in_s(self):
        s = jnp.linspace(0.0, 50.0, 21)
        for p in (HP, BP):
            vals = np.asarray(varswap.integrated_variance_laplace(p, s, 0.5))
            assert np.all(np.diff(vals) < 0)
            assert np.all(vals > 0)

    def test_ad_mean_matches_closed_form(self):
        """-d/ds log L(s/T) at s=0 is E[(1/T) int v dt]; it must equal the
        closed-form fair variance strike — for Bates this exercises BOTH
        pytree hooks (qv_laplace_extra differentiated vs qv_rate_extra)."""
        for p in (HP, BP):
            for T in (0.1, 0.5, 2.0):
                g = jax.grad(
                    lambda s: jnp.log(
                        varswap.integrated_variance_laplace(p, s / T, T))
                )(0.0)
                closed = float(varswap.fair_variance_strike(p, T))
                np.testing.assert_allclose(-float(g), closed, rtol=1e-8)


class TestVarianceSwap:
    def test_short_and_long_maturity_limits(self):
        jump_qv = float(BP.qv_rate_extra())
        near = float(varswap.fair_variance_strike(BP, 1e-4))
        np.testing.assert_allclose(near, 0.06 + jump_qv, rtol=1e-3)
        far = float(varswap.fair_variance_strike(BP, 50.0))
        np.testing.assert_allclose(far, 0.04 + jump_qv, rtol=1e-2)
        # pure diffusion: no jump loading
        np.testing.assert_allclose(
            float(varswap.fair_variance_strike(HP, 1e-4)), 0.06, rtol=1e-3)

    def test_forward_variance_chains(self):
        """Spot strikes must average forward strikes: K(0,t2) t2 =
        K(0,t1) t1 + K(t1,t2)(t2-t1)."""
        t1, t2 = 0.5, 1.25
        k1 = float(varswap.fair_variance_strike(HP, t1))
        k2 = float(varswap.fair_variance_strike(HP, t2))
        fwd = float(varswap.forward_variance(HP, t1, t2))
        np.testing.assert_allclose(k1 * t1 + fwd * (t2 - t1), k2 * t2,
                                   rtol=1e-10)
        # mean reversion from above: v0 > theta => forward strike below spot strike
        assert fwd < k1


class TestVolatilitySwap:
    def test_jensen_inequality(self):
        for p in (HP, BP):
            for T in (0.25, 1.0):
                kvol = float(varswap.fair_volatility_strike(p, T))
                kvar = float(varswap.fair_variance_strike(p, T))
                assert 0.0 < kvol < np.sqrt(kvar)

    def test_deterministic_variance_limit(self):
        """sigma -> 0 with lam = 0: I is deterministic, so the exact
        quadrature must return sqrt(E[I]).  (sigma = 1e-3, not smaller: the
        CIR exponent 2 kappa theta / sigma^2 grows like 1/sigma^2 and
        amplifies float64 rounding by that factor; at 1e-3 the conditioning
        is ~1.6e5 * eps ~ 3e-11 while the Jensen gap is ~1e-7.)"""
        p = HestonParams(kappa=2.0, theta=0.04, sigma=1e-3, rho=0.0, v0=0.06)
        kvol = float(varswap.fair_volatility_strike(p, 0.5))
        kvar = float(varswap.fair_variance_strike(p, 0.5))
        np.testing.assert_allclose(kvol, np.sqrt(kvar), rtol=1e-5)

    def test_matches_convexity_approx_for_moderate_volvol(self):
        """Brockhaus-Long second-order approximation should sit within ~1%
        of the exact quadrature at moderate vol-of-vol (and the exact value
        must be BELOW it only by higher-order terms)."""
        p = HestonParams(kappa=3.0, theta=0.04, sigma=0.25, rho=-0.5, v0=0.04)
        exact = float(varswap.fair_volatility_strike(p, 1.0))
        approx = float(varswap.volatility_convexity_approx(p, 1.0))
        np.testing.assert_allclose(exact, approx, rtol=1e-2)

    def test_quadrature_converged(self):
        a = float(varswap.fair_volatility_strike(BP, 0.75, n_nodes=128))
        b = float(varswap.fair_volatility_strike(BP, 0.75, n_nodes=256))
        np.testing.assert_allclose(a, b, rtol=1e-5)


def _otm_chain(params, S0, r, q, T, k_lo=0.25, k_hi=4.0, n=1200):
    """Dense OTM chain priced by the converged CF pricer."""
    F = S0 * np.exp((r - q) * T)
    K = np.linspace(k_lo * F, k_hi * F, n)
    is_call = K > F
    prices = np.asarray(heston.price_accurate(
        params, jnp.asarray(K), T, S0, r, q, is_call=jnp.asarray(is_call)))
    return K, prices, F


class TestStripReplication:
    S0, r, q, T = 100.0, 0.03, 0.01, 0.5

    def test_strip_replicates_heston_fair_variance(self):
        """Pure diffusion: the log-contract strip IS the variance swap."""
        K, Q, F = _otm_chain(HP, self.S0, self.r, self.q, self.T)
        strip = float(varswap.strip_variance(K, Q, F, self.T, self.r))
        fair = float(varswap.fair_variance_strike(HP, self.T))
        np.testing.assert_allclose(strip, fair, rtol=2e-3)

    def test_strip_jump_bias_bates(self):
        """Under jumps the strip is biased by the closed form
        2 lam (kbar - mu_j) - lam E[J^2]; the CF-priced chain must land on
        fair + bias, not on fair."""
        K, Q, F = _otm_chain(BP, self.S0, self.r, self.q, self.T)
        strip = float(varswap.strip_variance(K, Q, F, self.T, self.r))
        fair = float(varswap.fair_variance_strike(BP, self.T))
        bias = float(varswap.strip_jump_bias(BP))
        np.testing.assert_allclose(strip, fair + bias, rtol=2e-3)
        # and the bias is genuinely material for these params
        assert abs(bias) > 5e-4
        assert abs(strip - fair) > abs(bias) * 0.5

    def test_vix_index_scale(self):
        K, Q, F = _otm_chain(HP, self.S0, self.r, self.q, self.T)
        strip = float(varswap.strip_variance(K, Q, F, self.T, self.r))
        vix = float(varswap.vix_index(K, Q, F, self.T, self.r))
        np.testing.assert_allclose(vix, 100.0 * np.sqrt(strip), rtol=1e-10)
        assert 15.0 < vix < 40.0  # sane vol-points magnitude

    def test_strip_jittable_and_differentiable(self):
        K, Q, F = _otm_chain(HP, self.S0, self.r, self.q, self.T, n=201)
        f = jax.jit(varswap.strip_variance)
        val = float(f(jnp.asarray(K), jnp.asarray(Q), F, self.T, self.r))
        assert np.isfinite(val)
        g = jax.grad(
            lambda q: varswap.strip_variance(jnp.asarray(K), q, F,
                                             self.T, self.r)
        )(jnp.asarray(Q))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.all(np.asarray(g) >= 0)  # more option value => more variance
