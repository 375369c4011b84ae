"""VIX futures/options: exact-law checks, cross-method validation, MC pins.

Capability beyond the reference (src/cpp/models/heston.cpp prices equity
vanillas only); conventions follow the listed VIX contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import bates as bates_mod
from pde_tpu.models import vix
from pde_tpu.models.bates import BatesParams
from pde_tpu.models.heston import HestonParams
from pde_tpu.models import varswap

P = HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.03)
# Feller-violated set: d = 4*kappa*theta/sigma^2 = 0.64
P_NOFELLER = HestonParams(kappa=1.0, theta=0.04, sigma=0.5, rho=-0.6, v0=0.05)
PB = BatesParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.03,
                 lam=0.4, mu_j=-0.08, sigma_j=0.12)


def _law_np(params, T):
    c, d, lam = vix.cir_terminal_law(params, T)
    return float(c), float(d), float(lam)


class TestTerminalLaw:
    @pytest.mark.parametrize("params", [P, P_NOFELLER], ids=["feller", "nofeller"])
    @pytest.mark.parametrize("T", [0.05, 0.25, 1.0])
    def test_density_normalizes_and_moments(self, params, T):
        v, prob = vix._density_nodes(params, T, 320)
        mass = float(jnp.sum(prob))
        assert abs(mass - 1.0) < 5e-6
        c, d, lam = _law_np(params, T)
        mean_exact = c * (d + lam)   # = theta + (v0-theta) e^{-kT}
        var_exact = c * c * (2 * d + 4 * lam)
        mean_q = float(jnp.sum(prob * v))
        var_q = float(jnp.sum(prob * (v - mean_q) ** 2))
        assert abs(mean_q / mean_exact - 1.0) < 1e-5
        assert abs(var_q / var_exact - 1.0) < 1e-4

    def test_mean_matches_cir_closed_form(self):
        for T in (0.1, 0.5, 2.0):
            c, d, lam = _law_np(P, T)
            expected = 0.04 + (0.03 - 0.04) * np.exp(-2.0 * T)
            assert abs(c * (d + lam) - expected) < 1e-12


class TestFutures:
    @pytest.mark.parametrize("params", [P, P_NOFELLER, PB],
                             ids=["feller", "nofeller", "bates"])
    @pytest.mark.parametrize("T", [0.05, 0.25, 1.0])
    def test_two_routes_agree(self, params, T):
        f_lap = float(vix.vix_futures(params, T))
        f_den = float(vix.vix_futures_density(params, T))
        assert abs(f_lap / f_den - 1.0) < 2e-5

    def test_jensen_bound_and_spot_limit(self):
        a, b = vix.vix_squared_coeffs(P)
        for T in (0.1, 0.5, 1.0):
            fut = float(vix.vix_futures(P, T))
            ev = float(varswap.fair_variance_strike(P, T))  # not E[v_T]; use law
            c, d, lam = _law_np(P, T)
            upper = 100.0 * np.sqrt(float(a) * c * (d + lam) + float(b))
            assert fut < upper  # strict Jensen (v_T non-degenerate)
            assert fut > 0.8 * upper  # and not wildly below
        # T -> 0: futures -> spot VIX
        spot = float(vix.vix_spot(P))
        f_tiny = float(vix.vix_futures(P, 1e-4))
        assert abs(f_tiny - spot) < 0.05  # VIX points

    def test_term_structure_monotone_v0_below_theta(self):
        # v0 < theta: E[v_T] rises toward theta, futures term structure rises
        term = np.asarray(vix.vix_futures_term(P, jnp.array([0.1, 0.3, 0.6, 1.5])))
        assert np.all(np.diff(term) > 0)

    def test_bates_jump_premium(self):
        f_b = float(vix.vix_futures(PB, 0.25))
        f_h = float(vix.vix_futures(PB.heston(), 0.25))
        assert f_b > f_h  # 2 lam (kbar - mu_j) > 0 always


class TestOptions:
    def test_put_call_parity(self):
        T, r = 0.25, 0.03
        strikes = jnp.array([12.0, 17.0, 20.0, 25.0, 32.0])
        c = np.asarray(vix.vix_option(P, strikes, T, r, is_call=True))
        p = np.asarray(vix.vix_option(P, strikes, T, r, is_call=False))
        fut = float(vix.vix_futures(P, T))
        df = np.exp(-r * T)
        np.testing.assert_allclose(c - p, df * (fut - np.asarray(strikes)),
                                   rtol=0, atol=2e-4)

    def test_zero_strike_call_is_discounted_future(self):
        T, r = 0.5, 0.02
        c0 = float(vix.vix_option(P, 0.0, T, r, is_call=True))
        fut = float(vix.vix_futures(P, T))
        assert abs(c0 - np.exp(-r * T) * fut) < 2e-4

    def test_monotone_and_convex_in_strike(self):
        T = 0.25
        ks = jnp.linspace(10.0, 40.0, 31)
        c = np.asarray(vix.vix_option(P, ks, T, 0.0, is_call=True))
        assert np.all(np.diff(c) < 0)
        assert np.all(np.diff(c, 2) > -1e-8)  # convex

    def test_mc_pin_exact_sampling(self):
        # exact noncentral-chi-square sampling: zero discretization bias
        T, r = 0.25, 0.0
        c, d, lam = _law_np(P, T)
        rng = np.random.default_rng(7)
        v_t = c * rng.noncentral_chisquare(d, lam, size=2_000_000)
        a, b = map(float, vix.vix_squared_coeffs(P))
        vix_t = 100.0 * np.sqrt(a * v_t + b)
        fut_mc, fut_se = vix_t.mean(), vix_t.std() / np.sqrt(vix_t.size)
        assert abs(float(vix.vix_futures(P, T)) - fut_mc) < 4 * fut_se + 1e-3
        k = 20.0
        pay = np.maximum(vix_t - k, 0.0)
        call_mc, call_se = pay.mean(), pay.std() / np.sqrt(pay.size)
        assert abs(float(vix.vix_option(P, k, T, r)) - call_mc) < 4 * call_se + 1e-3

    def test_feller_violated_parity(self):
        T = 0.25
        ks = jnp.array([15.0, 22.0, 30.0])
        c = np.asarray(vix.vix_option(P_NOFELLER, ks, T, is_call=True))
        p = np.asarray(vix.vix_option(P_NOFELLER, ks, T, is_call=False))
        fut = float(vix.vix_futures(P_NOFELLER, T))
        np.testing.assert_allclose(c - p, fut - np.asarray(ks), rtol=0, atol=5e-4)

    def test_implied_vol_round_trip(self):
        T, r = 0.25, 0.01
        fut = float(vix.vix_futures(P, T))
        k = jnp.array([16.0, 20.0, 26.0])
        price = vix.vix_option(P, k, T, r, is_call=True)
        iv = vix.vix_implied_vol(price, fut, k, T, r)
        # Black-76 reprice through the same bs.price convention
        from pde_tpu.models import black_scholes as bs
        re = bs.price(fut, k, r, r, T, iv, is_call=True)
        np.testing.assert_allclose(np.asarray(re), np.asarray(price), rtol=1e-5)
        assert np.all(np.asarray(iv) > 0.3)  # vol-of-VIX is high


class TestJittability:
    def test_vmap_over_strikes_under_jit(self):
        f = jax.jit(lambda ks: vix.vix_option(P, ks, 0.25, 0.02))
        out = f(jnp.linspace(12.0, 30.0, 16))
        assert out.shape == (16,) and bool(jnp.all(jnp.isfinite(out)))

    def test_grad_futures_wrt_params(self):
        g = jax.grad(lambda v0: vix.vix_futures(
            HestonParams(2.0, 0.04, 0.3, -0.7, v0), 0.5))(0.03)
        assert float(g) > 0.0  # higher v0 -> higher futures
