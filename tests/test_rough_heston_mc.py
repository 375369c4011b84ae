"""Lifted rough-Heston Monte Carlo (models/rough_heston_mc.py).

Two independent routes to the same model cross-validate each other: the
fractional-Riccati CF pricer (exact up to quadrature) and the multifactor-
lift simulation.  At H = 1/2 a third route exists (the classic QE engine),
pinning the machinery; at low H the far wings carry the scheme's known
O(dt^H)-ish weak bias, so tolerances there are physical, not cosmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from math import gamma as math_gamma

from pde_tpu.models import heston
from pde_tpu.models.heston_mc import price_european_mc
from pde_tpu.models.rough_heston import RoughHestonParams, price_rough
from pde_tpu.models.rough_heston_mc import (
    lift_nodes,
    price_american_rough_lsm,
    price_european_rough_mc,
    simulate_lifted,
    simulate_lifted_paths,
)

ROUGH = RoughHestonParams(hurst=0.1, lam=2.0, theta=0.04, nu=0.3, rho=-0.7, v0=0.04)
H12 = RoughHestonParams(hurst=0.5, lam=2.0, theta=0.04, nu=0.3, rho=-0.7, v0=0.04)
CLASSIC = heston.HestonParams(kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04)
KEY = jax.random.PRNGKey(7)
N_PATHS = 1 << 15


class TestLiftNodes:
    def test_kernel_fit_accuracy(self):
        """The exponential sum must reproduce t^{alpha-1}/Gamma(alpha) to
        <1e-3 relative across the fitted time range."""
        c, x = lift_nodes(0.1, 20)
        c, x = np.asarray(c), np.asarray(x)
        alpha = 0.6
        for t in (1e-3, 1e-2, 0.1, 0.5, 2.0):
            k_true = t ** (alpha - 1.0) / math_gamma(alpha)
            k_apx = float(np.sum(c * np.exp(-x * t)))
            assert abs(k_apx / k_true - 1.0) < 1e-3, t

    def test_constant_kernel_at_h_half(self):
        """H = 1/2: K(t) = 1; the fit must return ~1 across the range."""
        c, x = lift_nodes(0.5, 20)
        c, x = np.asarray(c), np.asarray(x)
        for t in (1e-3, 0.1, 1.0):
            assert abs(float(np.sum(c * np.exp(-x * t))) - 1.0) < 1e-3


class TestClassicLimitMC:
    def test_matches_classic_cf_and_qe_at_h_half(self):
        """H = 1/2 in the lifted engine == classic Heston: prices must agree
        with the converged CF within a few stderr."""
        strikes = jnp.array([90.0, 100.0, 110.0])
        T, r = 0.25, 0.03
        cf = heston.price_accurate(CLASSIC, strikes, jnp.full(3, T),
                                   100.0, r, 0.0)
        mc, se = price_european_rough_mc(
            H12, strikes, T, 100.0, KEY, rate=r,
            n_steps=256, n_paths=N_PATHS,
        )
        err = np.abs(np.asarray(mc) - np.asarray(cf))
        assert np.all(err < 4.0 * np.asarray(se) + 0.01), (err, np.asarray(se))


class TestRoughCrossValidation:
    def test_matches_cf_pricer_near_the_money(self):
        """H = 0.1: the lifted MC and the fractional-Riccati CF are fully
        independent numerics; ITM/ATM prices must agree to ~1%."""
        strikes = jnp.array([90.0, 100.0])
        cf = price_rough(ROUGH, strikes, 0.25, 100.0, 0.03, 0.0, n_steps=256)
        mc, se = price_european_rough_mc(
            ROUGH, strikes, 0.25, 100.0, KEY, rate=0.03,
            n_steps=256, n_paths=N_PATHS,
        )
        rel = np.abs(np.asarray(mc) / np.asarray(cf) - 1.0)
        assert np.all(rel < 0.01), rel

    def test_wing_bias_bounded(self):
        """Far-OTM wing at low H carries the documented Euler-family weak
        bias — bound it at 7% so regressions are caught without pretending
        the scheme is better than it is."""
        cf = price_rough(ROUGH, jnp.array([110.0]), 0.25, 100.0, 0.03, 0.0,
                         n_steps=256)
        mc, _ = price_european_rough_mc(
            ROUGH, jnp.array([110.0]), 0.25, 100.0, KEY, rate=0.03,
            n_steps=256, n_paths=N_PATHS,
        )
        assert abs(float(mc[0]) / float(cf[0]) - 1.0) < 0.07


class TestSimulation:
    def test_path_statistics_sane(self):
        paths = simulate_lifted(ROUGH, 100.0, 0.5, KEY,
                                n_steps=64, n_paths=4096)
        assert bool(jnp.all(paths.s_max >= paths.spot))
        assert bool(jnp.all(paths.s_min <= paths.spot))
        assert bool(jnp.all(paths.s_max >= 100.0))  # includes S_0
        assert bool(jnp.all(paths.variance >= 0.0))
        assert bool(jnp.all(jnp.isfinite(paths.s_avg)))

    def test_stored_paths_terminal_matches_accumulator(self):
        s_path, v_path = simulate_lifted_paths(
            ROUGH, 100.0, 0.5, KEY, n_steps=64, n_paths=4096)
        term = simulate_lifted(ROUGH, 100.0, 0.5, KEY,
                               n_steps=64, n_paths=4096)
        np.testing.assert_allclose(
            np.asarray(s_path[-1]), np.asarray(term.spot), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(v_path[-1]), np.asarray(term.variance), rtol=1e-12)

    def test_martingale_property(self):
        """E[S_T e^{-(r-q)T}] = S_0 within MC error."""
        paths = simulate_lifted(ROUGH, 100.0, 1.0, KEY, rate=0.05,
                                n_steps=128, n_paths=N_PATHS)
        mean_s = float(jnp.mean(paths.spot)) * np.exp(-0.05)
        assert abs(mean_s / 100.0 - 1.0) < 0.01

    def test_odd_antithetic_rejected(self):
        with pytest.raises(ValueError, match="even"):
            simulate_lifted(ROUGH, 100.0, 0.5, KEY, n_steps=8, n_paths=101)


class TestRoughAmerican:
    @pytest.mark.slow
    def test_american_put_dominates_european(self):
        eur, _ = price_european_rough_mc(
            ROUGH, 100.0, 0.5, 100.0, KEY, rate=0.05, is_call=False,
            n_steps=64, n_paths=N_PATHS,
        )
        amer, se = price_american_rough_lsm(
            ROUGH, 100.0, 0.5, 100.0, KEY, rate=0.05, is_call=False,
            n_steps=64, n_paths=N_PATHS,
        )
        assert float(amer) > float(eur)  # r > 0: early exercise has value

    def test_american_dominates_intrinsic_deep_itm(self):
        amer, _ = price_american_rough_lsm(
            ROUGH, 125.0, 0.5, 100.0, KEY, rate=0.05, is_call=False,
            n_steps=64, n_paths=N_PATHS,
        )
        assert float(amer) >= 25.0 - 1e-9
