"""Heston Monte Carlo (Andersen QE) — cross-validation against the
characteristic-function pricer and exact pathwise identities.

The reference platform has no MC option pricer (its only MC lives in the
backtest bootstrap, backtesting/analysis.py:631-841); these tests validate
the new engine against the quadrature path the reference DOES have
(src/cpp/models/heston.cpp:94-151) plus model-free identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import heston, heston_mc
from pde_tpu.models.heston import HestonParams

PARAMS = HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
# sigma^2 >> 2 kappa theta: Feller violated, the QE exponential branch
# (psi > 1.5) actually exercises
PARAMS_ROUGH = HestonParams(1.0, 0.04, 0.8, -0.9, 0.04)
S0, R, Q, T = 100.0, 0.05, 0.02, 0.75
KEY = jax.random.PRNGKey(7)
N_PATHS = 1 << 15
N_STEPS = 32


class TestQEScheme:
    def test_martingale_property(self):
        """K0* correction: E[e^{-(r-q)T} S_T] = S0 exactly (up to MC noise)."""
        paths = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=N_STEPS, n_paths=N_PATHS,
            rate=R, dividend=Q,
        )
        fwd = float(jnp.mean(paths.spot)) * np.exp(-(R - Q) * T)
        assert abs(fwd / S0 - 1.0) < 5e-3

    def test_variance_moments(self):
        """Terminal variance matches the exact CIR mean."""
        paths = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=N_STEPS, n_paths=N_PATHS,
        )
        e = np.exp(-PARAMS.kappa * T)
        exact_mean = PARAMS.theta + (PARAMS.v0 - PARAMS.theta) * e
        assert abs(float(jnp.mean(paths.variance)) / exact_mean - 1.0) < 2e-2
        assert float(jnp.min(paths.variance)) >= 0.0

    def test_path_statistics_ordering(self):
        paths = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=N_STEPS, n_paths=256,
        )
        assert bool(jnp.all(paths.s_max >= paths.spot))
        assert bool(jnp.all(paths.s_min <= paths.spot))
        assert bool(jnp.all(paths.s_max >= paths.s_avg))
        assert bool(jnp.all(paths.s_min <= paths.s_avg))
        assert bool(jnp.all(paths.s_max >= S0))  # extrema include S_0
        assert bool(jnp.all(paths.s_min <= S0))

    def test_antithetic_mirrors(self):
        """Second half of the path axis uses mirrored draws: the terminal
        spots must differ but average to a tighter forward estimate."""
        n = 1 << 12
        anti = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=8, n_paths=n, antithetic=True,
        )
        plain = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=8, n_paths=n, antithetic=False,
        )
        assert not np.allclose(np.asarray(anti.spot), np.asarray(plain.spot))
        assert anti.spot.shape == (n,)

    def test_odd_paths_with_antithetic_raises(self):
        with pytest.raises(ValueError):
            heston_mc.simulate_qe(PARAMS, S0, T, KEY, n_steps=4, n_paths=3)


class TestEuropeanCrossValidation:
    @pytest.mark.parametrize("params", [PARAMS, PARAMS_ROUGH], ids=["feller", "rough"])
    def test_matches_carr_madan(self, params):
        strikes = jnp.array([90.0, 100.0, 110.0])
        mc, se = heston_mc.price_european_mc(
            params, strikes, T, S0, KEY, rate=R, dividend=Q,
            n_steps=N_STEPS, n_paths=N_PATHS,
        )
        exact = heston.price_accurate(params, strikes, T, S0, R, Q)
        err = np.abs(np.asarray(mc) - np.asarray(exact))
        # within 5 standard errors AND absolutely tight (CV + antithetic
        # leave ~cents of noise at 32k paths; discretization bias at 32
        # steps is of the same order)
        assert np.all(err < 5.0 * np.asarray(se) + 0.05), (mc, exact, se)
        assert np.all(np.asarray(se) < 0.1)

    def test_put_call_parity_pathwise(self):
        """Same key, no control variate: C - P == disc * E[S_T - K] exactly
        per path, so parity holds to float roundoff."""
        k = 105.0
        call, _ = heston_mc.price_european_mc(
            PARAMS, k, T, S0, KEY, rate=R, dividend=Q, is_call=True,
            n_steps=16, n_paths=1 << 12, control_variate=False,
        )
        put, _ = heston_mc.price_european_mc(
            PARAMS, k, T, S0, KEY, rate=R, dividend=Q, is_call=False,
            n_steps=16, n_paths=1 << 12, control_variate=False,
        )
        paths = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=16, n_paths=1 << 12, rate=R, dividend=Q,
        )
        rhs = np.exp(-R * T) * float(jnp.mean(paths.spot - k))
        assert abs(float(call - put) - rhs) < 1e-8

    def test_stderr_calibrated_under_antithetic(self):
        """Reported stderr must match the empirical spread of the estimator.

        Regression for treating the 2N antithetic paths as independent: a
        deep-ITM call payoff is nearly linear, so each (path, mirror) pair
        is almost perfectly anti-correlated and the i.i.d. formula
        over-reports the error ~5-10x (z-scores bunched near zero).  With
        pair-folded stderr the z-scores are ~N(0,1).
        """
        keys = jax.random.split(jax.random.PRNGKey(11), 24)

        def one(k):
            return heston_mc.price_european_mc(
                PARAMS, 60.0, T, S0, k, rate=R, dividend=Q,
                n_steps=16, n_paths=1 << 13, control_variate=False,
            )

        prices, stderrs = jax.vmap(one)(keys)
        prices, stderrs = np.asarray(prices), np.asarray(stderrs)
        z = (prices - prices.mean()) / stderrs
        assert 0.55 < z.std(ddof=1) < 1.8, (z.std(ddof=1), stderrs.mean())

    def test_control_variate_reduces_stderr(self):
        # antithetic=False isolates the CV: with antithetic on, the pair
        # fold already removes the same (linear-in-S_T) variance component
        # the discounted-spot control variate targets, so the two overlap
        # and the marginal CV gain is small.
        _, se_cv = heston_mc.price_european_mc(
            PARAMS, 100.0, T, S0, KEY, rate=R, dividend=Q,
            n_steps=16, n_paths=1 << 13, control_variate=True,
            antithetic=False,
        )
        _, se_raw = heston_mc.price_european_mc(
            PARAMS, 100.0, T, S0, KEY, rate=R, dividend=Q,
            n_steps=16, n_paths=1 << 13, control_variate=False,
            antithetic=False,
        )
        assert float(se_cv) < 0.7 * float(se_raw)


class TestExotics:
    def test_barrier_in_out_parity(self):
        """up-and-in + up-and-out == vanilla on the SAME paths (exact)."""
        k, b = 100.0, 115.0
        kw = dict(rate=R, dividend=Q, n_steps=N_STEPS, n_paths=1 << 13)
        uo, _ = heston_mc.price_barrier_mc(
            PARAMS, k, b, T, S0, KEY, barrier_type="up-and-out", **kw)
        ui, _ = heston_mc.price_barrier_mc(
            PARAMS, k, b, T, S0, KEY, barrier_type="up-and-in", **kw)
        vanilla, _ = heston_mc.price_european_mc(
            PARAMS, k, T, S0, KEY, control_variate=False, **kw)
        assert abs(float(uo + ui) - float(vanilla)) < 1e-8
        assert 0.0 < float(uo) < float(vanilla)

    def test_far_barrier_is_vanilla(self):
        k = 100.0
        kw = dict(rate=R, dividend=Q, n_steps=16, n_paths=1 << 12)
        uo, _ = heston_mc.price_barrier_mc(
            PARAMS, k, 1e7, T, S0, KEY, barrier_type="up-and-out", **kw)
        vanilla, _ = heston_mc.price_european_mc(
            PARAMS, k, T, S0, KEY, control_variate=False, **kw)
        assert abs(float(uo) - float(vanilla)) < 1e-10

    def test_bad_barrier_type_raises(self):
        with pytest.raises(ValueError):
            heston_mc.price_barrier_mc(
                PARAMS, 100.0, 110.0, T, S0, KEY, barrier_type="sideways")

    def test_asian_below_european(self):
        """Averaging reduces effective volatility: Asian < European call."""
        k = 100.0
        kw = dict(rate=R, dividend=Q, n_steps=N_STEPS, n_paths=1 << 13)
        asian, _ = heston_mc.price_asian_mc(PARAMS, k, T, S0, KEY, **kw)
        euro, _ = heston_mc.price_european_mc(PARAMS, k, T, S0, KEY, **kw)
        assert 0.0 < float(asian) < float(euro)

    def test_lookback_dominates_european(self):
        """Pathwise S_T - min S >= (S_T - S_0)+ since min <= S_0."""
        kw = dict(rate=R, dividend=Q, n_steps=16, n_paths=1 << 12)
        lb, _ = heston_mc.price_lookback_mc(PARAMS, T, S0, KEY, **kw)
        euro, _ = heston_mc.price_european_mc(
            PARAMS, S0, T, S0, KEY, control_variate=False, **kw)
        assert float(lb) >= float(euro) - 1e-10

    def test_fixed_strike_lookback(self):
        kw = dict(rate=R, dividend=Q, n_steps=16, n_paths=1 << 12)
        lb_fixed, _ = heston_mc.price_lookback_mc(
            PARAMS, T, S0, KEY, strike=100.0, **kw)
        euro, _ = heston_mc.price_european_mc(
            PARAMS, 100.0, T, S0, KEY, control_variate=False, **kw)
        # (max S - K)+ >= (S_T - K)+ pathwise
        assert float(lb_fixed) >= float(euro) - 1e-10
