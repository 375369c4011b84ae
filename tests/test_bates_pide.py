"""Bates 2D PIDE solver tests (solvers/bates_pide.py).

Oracles, all independent of the ADI discretization: the Bates CF quadrature
(models/bates.py price_accurate) for the European limit, the diffusion-only
ADI solver for lam = 0, the 1D Kou PIDE for the degenerate-volatility limit,
and the Longstaff-Schwartz MC under Bates for the American route.  The
reference has no PDE/PIDE route under jumps at all (its jump pricing stops
at the CF, src/cpp/models/heston.cpp:74-151 has no jump term and no solver
consumes one).
"""

import jax
import numpy as np
import pytest

from pde_tpu.models.bates import BatesParams, price_accurate
from pde_tpu.solvers import heston_adi
from pde_tpu.solvers.bates_pide import BatesPIDEParams, solve_bates_pide
from pde_tpu.solvers.pide import KouJumps, MertonJumps, solve_pide

S0 = 100.0
MJ = MertonJumps(0.5, -0.1, 0.15)
BP = BatesParams(2.0, 0.04, 0.3, -0.7, 0.04, 0.5, -0.1, 0.15)


def test_european_call_vs_cf_quadrature():
    cf = float(np.asarray(
        price_accurate(BP, 100.0, 1.0, S0, rate=0.05, dividend=0.02)))
    res = solve_bates_pide(BatesPIDEParams(q=0.02, jumps=MJ), S0)
    assert abs(float(res.price) - cf) / cf < 5e-3


def test_grid_refinement_converges_to_cf():
    cf = float(np.asarray(
        price_accurate(BP, 100.0, 1.0, S0, rate=0.05, dividend=0.02)))
    coarse = solve_bates_pide(BatesPIDEParams(q=0.02, jumps=MJ), S0)
    fine = solve_bates_pide(
        BatesPIDEParams(q=0.02, jumps=MJ, n_spot=200, n_vol=100, n_time=200),
        S0)
    assert abs(float(fine.price) - cf) < abs(float(coarse.price) - cf)
    assert abs(float(fine.price) - cf) / cf < 1e-3


def test_zero_intensity_reduces_to_heston_adi():
    """lam = 0 must reproduce the diffusion-only Douglas march EXACTLY —
    same operators, same sweeps, the jump path contributing zeros."""
    none = MertonJumps(0.0, 0.0, 0.2)
    r0 = solve_bates_pide(BatesPIDEParams(q=0.02, jumps=none), S0)
    h0 = heston_adi.solve(heston_adi.HestonPDEParams(q=0.02), S0)
    assert abs(float(r0.price) - float(h0.price)) < 1e-10


def test_kou_degenerate_vol_matches_1d_pide():
    """sigma_v -> 0 with v0 = theta pins the variance: the 2D Kou-SVJ price
    must match the 1D Kou PIDE at bs_vol = sqrt(v0)."""
    kj = KouJumps(1.0, 0.4, 10.0, 5.0)
    p2d = BatesPIDEParams(
        kappa=2.0, theta=0.04, sigma=1e-6, rho=0.0, v0=0.04, r=0.05, q=0.02,
        T=0.5, K=100.0, jumps=kj, n_spot=200, n_vol=50, n_time=200)
    r2d = solve_bates_pide(p2d, S0)
    r1d = solve_pide(kj, 0.2, 0.05, 0.02, 0.5, 100.0, S0,
                     n_space=512, n_time=128)
    assert abs(float(r2d.price) - float(r1d.price[0])) / float(r1d.price[0]) < 2e-3


def test_american_put_bounds_and_methods_agree():
    p = BatesPIDEParams(q=0.02, is_call=False, jumps=MJ)
    euro = solve_bates_pide(p, S0)
    proj = solve_bates_pide(p._replace(american=True), S0)
    it = solve_bates_pide(p._replace(american=True,
                                     american_method="it_lcp"), S0)
    assert float(proj.price) >= float(euro.price)
    assert float(proj.price) >= 0.0
    # the two LCP treatments agree to discretization accuracy
    assert abs(float(proj.price) - float(it.price)) < 2e-2
    # material early-exercise premium for an ATM put under r > q
    assert float(proj.price) - float(euro.price) > 0.1


@pytest.mark.slow
def test_american_put_vs_lsm_mc():
    """PIDE American put vs Longstaff-Schwartz under the SAME Bates dynamics
    (models/bates.price_american_mc) — two fully independent methods."""
    from pde_tpu.models.bates import price_american_mc

    p = BatesPIDEParams(q=0.02, is_call=False, american=True, jumps=MJ,
                        n_spot=200, n_vol=100, n_time=200)
    pide_price = float(solve_bates_pide(p, S0).price)
    mc = np.asarray(price_american_mc(
        BP, 100.0, 1.0, S0, jax.random.PRNGKey(7), rate=0.05, dividend=0.02,
        is_call=False, n_steps=100, n_paths=1 << 16))
    price_mc, se = float(mc[0]), float(mc[1])
    # LSM is biased slightly low (suboptimal exercise); allow 4 se + bias room
    assert pide_price > price_mc - 4.0 * se - 0.05
    assert abs(pide_price - price_mc) < 0.15


def test_greeks_sane():
    res = solve_bates_pide(BatesPIDEParams(q=0.02, jumps=MJ), S0)
    assert 0.0 < float(res.delta) < 1.0
    assert float(res.gamma) > 0.0
    assert float(res.vega) > 0.0
    assert float(res.theta) < 0.0


def test_gamma_vs_cf_central_difference():
    """Gamma readout vs a central FD of the (independent) CF price — pins
    the log-grid conversion (V_xx - V_x)/S^2; the naive uniform-S stencil
    has an O(1) ~delta/S bias on a log grid."""
    h = 1.0

    def cf(s):
        return float(np.asarray(
            price_accurate(BP, 100.0, 1.0, s, rate=0.05, dividend=0.02)))

    g_fd = (cf(S0 + h) - 2.0 * cf(S0) + cf(S0 - h)) / (h * h)
    res = solve_bates_pide(BatesPIDEParams(q=0.02, jumps=MJ), S0)
    assert abs(float(res.gamma) - g_fd) / g_fd < 0.05


def test_input_validation():
    with pytest.raises(TypeError):
        solve_bates_pide(BatesPIDEParams(jumps=object()), S0)
    with pytest.raises(ValueError):
        solve_bates_pide(BatesPIDEParams(jumps=MJ, american_method="x"), S0)
    with pytest.raises(ValueError):
        solve_bates_pide(BatesPIDEParams(jumps=MJ, n_vol=4), S0)
