"""Jump-diffusion PIDE solver tests (solvers/pide.py).

Oracles: the Merton (1976) Poisson-mixture series (models/bates.py
merton_reference_price, pure numpy/scipy) and a float64 Gil-Pelaez
quadrature of the Kou CF (solvers/pide.kou_reference_price) — both fully
independent of the solver's discretization.  The reference framework has no
PIDE solver (its 1D solver at src/cpp/solvers/black_scholes_pde.hpp:97-147
is local-operator only); these tests define the family's contract here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models.bates import merton_reference_price
from pde_tpu.solvers import bs_pde
from pde_tpu.solvers.pide import (
    KouJumps,
    MertonJumps,
    kou_reference_price,
    solve_pide,
)

S0, R, Q, SIG = 100.0, 0.05, 0.02, 0.2
KS = np.array([80.0, 90.0, 100.0, 110.0, 120.0])
MERTON = MertonJumps(lam=0.5, mu_j=-0.1, sigma_j=0.15)
KOU = KouJumps(lam=1.0, p=0.4, eta1=10.0, eta2=5.0)


@pytest.mark.parametrize("is_call", [True, False])
def test_merton_european_vs_series(is_call):
    T = 0.5
    res = solve_pide(MERTON, SIG, R, Q, T, KS, S0, is_call=is_call)
    ref = merton_reference_price(
        KS, T, S0, R, Q, SIG, *MERTON, is_call=is_call
    )
    np.testing.assert_allclose(np.array(res.price), ref, rtol=3e-3, atol=5e-3)


@pytest.mark.parametrize("is_call", [True, False])
def test_kou_european_vs_gil_pelaez(is_call):
    T = 0.5
    res = solve_pide(KOU, SIG, R, Q, T, KS, S0, is_call=is_call)
    ref = kou_reference_price(KS, T, S0, R, Q, SIG, *KOU, is_call=is_call)
    np.testing.assert_allclose(np.array(res.price), ref, rtol=3e-3, atol=5e-3)


def test_second_order_convergence():
    """Halving (dx, dt) must cut the Merton error by ~4 (trapezoid + CN)."""
    T = 0.5
    ref = merton_reference_price(KS, T, S0, R, Q, SIG, *MERTON)
    coarse = solve_pide(MERTON, SIG, R, Q, T, KS, S0, n_space=256, n_time=64)
    fine = solve_pide(MERTON, SIG, R, Q, T, KS, S0, n_space=512, n_time=128)
    e_c = np.max(np.abs(np.array(coarse.price) - ref))
    e_f = np.max(np.abs(np.array(fine.price) - ref))
    assert e_f < e_c / 3.0


def test_zero_intensity_reduces_to_bs_pde():
    """lam = 0 must reproduce the plain CN solver to grid accuracy."""
    T, K = 1.0, 100.0
    none = MertonJumps(lam=0.0, mu_j=0.0, sigma_j=0.2)
    res = solve_pide(none, SIG, R, Q, T, K, S0, is_call=True,
                     n_space=512, n_time=128)
    base = bs_pde.solve(
        bs_pde.BSPDEParams(sigma=SIG, r=R, q=Q, T=T, K=K, is_call=True,
                           n_space=512, n_time=128), S0
    )
    assert abs(float(res.price[0]) - float(base.price)) < 2e-2
    # and against the closed form, which both discretizations approximate
    from pde_tpu.models.black_scholes import price as bs_price
    exact = float(bs_price(S0, K, R, Q, T, SIG, is_call=True))
    assert abs(float(res.price[0]) - exact) < 2e-2


def test_put_call_parity():
    T = 0.75
    call = solve_pide(KOU, SIG, R, Q, T, KS, S0, is_call=True)
    put = solve_pide(KOU, SIG, R, Q, T, KS, S0, is_call=False)
    lhs = np.array(call.price) - np.array(put.price)
    rhs = S0 * np.exp(-Q * T) - KS * np.exp(-R * T)
    np.testing.assert_allclose(lhs, rhs, atol=2e-2)


def test_american_put_bounds():
    T = 0.5
    euro = solve_pide(MERTON, SIG, R, Q, T, KS, S0, is_call=False)
    amer = solve_pide(MERTON, SIG, R, Q, T, KS, S0, is_call=False,
                      american=True)
    a, e = np.array(amer.price), np.array(euro.price)
    assert np.all(a >= e - 1e-10)
    assert np.all(a >= np.maximum(KS - S0, 0.0) - 1e-10)
    # early-exercise premium must be material deep ITM under r > q
    assert a[-1] - e[-1] > 1e-3


def test_american_call_no_dividend_equals_european():
    """With q = 0 an American call is never exercised early (Merton 1973) —
    under jumps too, since the discounted payoff stays a submartingale."""
    T = 0.5
    euro = solve_pide(MERTON, SIG, R, 0.0, T, KS, S0, is_call=True)
    amer = solve_pide(MERTON, SIG, R, 0.0, T, KS, S0, is_call=True,
                      american=True)
    np.testing.assert_allclose(
        np.array(amer.price), np.array(euro.price), rtol=2e-3, atol=2e-3
    )


def test_strike_strip_matches_scalar():
    """A batched strip must equal per-strike scalar solves exactly (the
    grid, operators, and jump matmul are strike-independent)."""
    T = 0.5
    strip = solve_pide(KOU, SIG, R, Q, T, KS, S0)
    for i, k in enumerate(KS):
        solo = solve_pide(KOU, SIG, R, Q, T, float(k), S0)
        assert abs(float(strip.price[i]) - float(solo.price[0])) < 1e-12


def test_greeks_shapes_and_signs():
    T = 0.5
    res = solve_pide(MERTON, SIG, R, Q, T, KS, S0, is_call=True)
    assert res.price.shape == res.delta.shape == res.gamma.shape == (5,)
    assert np.all(np.array(res.delta) > 0.0)   # calls
    assert np.all(np.array(res.gamma) > 0.0)   # convex payoff
    # deltas decrease with strike
    assert np.all(np.diff(np.array(res.delta)) < 0.0)


def test_greeks_vs_bs_exact():
    """lam = 0: delta and gamma must match closed-form BS greeks.  Pins the
    log-grid readout — the naive uniform-S central stencil carries an O(1)
    ~delta/S gamma bias on a log grid that refinement does not remove."""
    from scipy.stats import norm

    none = MertonJumps(lam=0.0, mu_j=0.0, sigma_j=0.2)
    K, T = 100.0, 0.5
    res = solve_pide(none, SIG, R, Q, T, K, S0, is_call=True)
    d1 = (np.log(S0 / K) + (R - Q + 0.5 * SIG**2) * T) / (SIG * np.sqrt(T))
    delta_bs = np.exp(-Q * T) * norm.cdf(d1)
    gamma_bs = np.exp(-Q * T) * norm.pdf(d1) / (S0 * SIG * np.sqrt(T))
    assert abs(float(res.delta[0]) - delta_bs) < 3e-4
    assert abs(float(res.gamma[0]) - gamma_bs) < 3e-4


def test_kou_tail_identities():
    """tail_up(z) + tail_down(z) must recover total mass 1 and e^y-mass
    1 + kbar for any z, on both sides of the kink."""
    for z in (-0.7, -0.05, 0.0, 0.05, 0.7):
        bu, au = KOU.tail_up(jnp.asarray(z))
        bd, ad = KOU.tail_down(jnp.asarray(z))
        assert abs(float(bu + bd) - 1.0) < 1e-12
        assert abs(float(au + ad) - (1.0 + float(KOU.kbar))) < 1e-12
    mu, am = MERTON.tail_up(jnp.asarray(0.1))
    md, admn = MERTON.tail_down(jnp.asarray(0.1))
    assert abs(float(mu + md) - 1.0) < 1e-12
    assert abs(float(am + admn) - (1.0 + float(MERTON.kbar))) < 1e-12


def test_input_validation():
    with pytest.raises(TypeError):
        solve_pide(object(), SIG, R, Q, 0.5, KS, S0)
    with pytest.raises(ValueError):
        solve_pide(MERTON, SIG, R, Q, 0.5, KS, S0, scheme="explicit")
    with pytest.raises(ValueError):
        solve_pide(MERTON, SIG, R, Q, 0.5, KS, S0, fp_iterations=0)
    with pytest.raises(ValueError):
        solve_pide(MERTON, SIG, R, Q, 0.5, KS, S0, n_space=8)
