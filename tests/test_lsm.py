"""Longstaff-Schwartz American MC vs the ADI LCP solver and model-free bounds.

The ADI Ikonen-Toivanen path (solvers/heston_adi.py, reference scheme
src/cpp/solvers/heston_pde.hpp:143-150) is the grid-based American oracle;
LSM must land inside its discretization band.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import heston
from pde_tpu.models.heston import HestonParams
from pde_tpu.solvers import heston_adi
from pde_tpu.solvers.lsm import price_american_lsm, price_american_lsm_batch

PARAMS = HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
S0, R, T = 100.0, 0.05, 1.0
KEY = jax.random.PRNGKey(11)
N_PATHS = 1 << 15
N_STEPS = 50


def _adi_american_put(strike, q=0.0):
    hp = heston_adi.HestonPDEParams(
        kappa=PARAMS.kappa, theta=PARAMS.theta, sigma=PARAMS.sigma,
        rho=PARAMS.rho, v0=PARAMS.v0, r=R, q=q, T=T, K=strike,
        is_call=False, american=True, american_method="it_lcp",
    )
    return float(heston_adi.solve(hp, S0).price)


class TestAmericanLSM:
    def test_put_matches_adi_lcp(self):
        lsm, se = price_american_lsm(
            PARAMS, 100.0, T, S0, KEY, rate=R,
            n_steps=N_STEPS, n_paths=N_PATHS,
        )
        adi = _adi_american_put(100.0)
        # both carry ~0.2% discretization; LSM adds MC noise (se ~ cents)
        assert abs(float(lsm) - adi) < max(0.02 * adi, 5.0 * float(se)), (
            float(lsm), adi, float(se))

    def test_put_dominates_european(self):
        lsm, _ = price_american_lsm(
            PARAMS, 100.0, T, S0, KEY, rate=R,
            n_steps=N_STEPS, n_paths=N_PATHS,
        )
        euro = float(heston.price_accurate(
            PARAMS, jnp.array([100.0]), T, S0, R, 0.0, is_call=False)[0])
        assert float(lsm) > euro  # r > 0: early exercise is worth something

    def test_put_dominates_intrinsic(self):
        """Deep ITM American put is worth at least intrinsic."""
        k = 130.0
        lsm, _ = price_american_lsm(
            PARAMS, k, T, S0, KEY, rate=R, n_steps=N_STEPS, n_paths=N_PATHS,
        )
        assert float(lsm) >= (k - S0) - 0.05

    def test_call_no_dividend_is_european(self):
        """q=0: early exercise of a call is never optimal, so LSM must
        reproduce the European price (regression noise may only shave it)."""
        lsm, se = price_american_lsm(
            PARAMS, 100.0, T, S0, KEY, rate=R, is_call=True,
            n_steps=N_STEPS, n_paths=N_PATHS,
        )
        euro = float(heston.price_accurate(
            PARAMS, jnp.array([100.0]), T, S0, R, 0.0, is_call=True)[0])
        assert abs(float(lsm) - euro) < max(0.01 * euro, 5.0 * float(se))

    def test_exercise_boundary_monotonicity(self):
        """More exercise rights are worth more: Bermudan(25) <= Bermudan(50)
        up to MC noise (same key => common random numbers)."""
        p25, se25 = price_american_lsm(
            PARAMS, 100.0, T, S0, KEY, rate=R, n_steps=25, n_paths=N_PATHS,
        )
        p50, se50 = price_american_lsm(
            PARAMS, 100.0, T, S0, KEY, rate=R, n_steps=50, n_paths=N_PATHS,
        )
        noise = 3.0 * float(jnp.sqrt(se25**2 + se50**2))
        assert float(p50) >= float(p25) - noise

    def test_stored_paths_match_accumulator_sim(self):
        """simulate_qe_paths terminal slice == simulate_qe terminal state
        (same key, same scheme constants)."""
        from pde_tpu.models import heston_mc

        s_path, v_path = heston_mc.simulate_qe_paths(
            PARAMS, S0, T, KEY, n_steps=16, n_paths=1 << 10, rate=R,
        )
        terminal = heston_mc.simulate_qe(
            PARAMS, S0, T, KEY, n_steps=16, n_paths=1 << 10, rate=R,
        )
        np.testing.assert_allclose(
            np.asarray(s_path[-1]), np.asarray(terminal.spot), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(v_path[-1]), np.asarray(terminal.variance), rtol=1e-12)
        # terminal.s_max includes S_0 in the running max; the stored paths
        # start at t_1, so max(stored, S0) must reproduce it
        np.testing.assert_allclose(
            np.maximum(np.asarray(s_path).max(axis=0), S0),
            np.asarray(terminal.s_max), rtol=1e-12)


class TestLSMBatch:
    def test_batch_matches_single_exactly(self):
        """Same key => same paths => the vmapped per-strike regression must
        reproduce the single-contract pricer bit-for-bit per strike."""
        strikes = jnp.array([90.0, 100.0, 110.0])
        prices_b, se_b = price_american_lsm_batch(
            PARAMS, strikes, False, T, S0, KEY, rate=R,
            n_steps=16, n_paths=1 << 12,
        )
        for i, k in enumerate([90.0, 100.0, 110.0]):
            p1, se1 = price_american_lsm(
                PARAMS, k, T, S0, KEY, rate=R, n_steps=16, n_paths=1 << 12,
            )
            np.testing.assert_allclose(float(prices_b[i]), float(p1),
                                       rtol=1e-12)
            np.testing.assert_allclose(float(se_b[i]), float(se1), rtol=1e-12)

    def test_mixed_calls_and_puts_monotone(self):
        """One book, mixed sides: put prices increase in strike, call prices
        decrease (shared paths cannot break per-contract monotonicity)."""
        strikes = jnp.array([85.0, 95.0, 105.0, 115.0])
        puts, _ = price_american_lsm_batch(
            PARAMS, strikes, False, T, S0, KEY, rate=R,
            n_steps=16, n_paths=1 << 13,
        )
        calls, _ = price_american_lsm_batch(
            PARAMS, strikes, True, T, S0, KEY, rate=R,
            n_steps=16, n_paths=1 << 13,
        )
        assert bool(jnp.all(jnp.diff(puts) > 0))
        assert bool(jnp.all(jnp.diff(calls) < 0))
