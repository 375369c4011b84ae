"""Bermudan swaption tests: European collapse pins both routes to the
Jamshidian closed form; the full schedule is validated by the
PDE-inside-the-MC-sandwich cross-check and ordering identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import rates
from pde_tpu.solvers import bermudan_hw as bh


@pytest.fixture(scope="module")
def hw():
    curve = rates.curve_from_zero_rates(
        jnp.array([0.5, 1.0, 2.0, 5.0, 10.0, 30.0]),
        jnp.array([0.030, 0.032, 0.035, 0.040, 0.042, 0.043]))
    return rates.HullWhiteParams(jnp.asarray(0.1), jnp.asarray(0.012), curve)


@pytest.fixture(scope="module")
def trade(hw):
    sched = jnp.arange(1.0, 5.01, 0.5)        # 1y into 4y, semi-annual
    K = float(rates.hw_swap_rate(hw.curve, 1.0, sched[1:]))
    return sched, K


def test_joint_increment_martingale(hw):
    """E[e^{-int r}] over [0, T] from closed-form moments must reproduce
    the curve EXACTLY: -A + v_y/2 = log P(0,T) in exact arithmetic."""
    for T in (0.5, 2.0, 10.0):
        _, _, _, v_y, _ = bh.hw_joint_increment_moments(hw, T)
        A = bh.hw_alpha_integral(hw, 0.0, T)
        lhs = float(-A + 0.5 * v_y)
        assert abs(lhs - float(jnp.log(hw.curve.df(T)))) < 1e-12


def test_alpha_integral_vs_quadrature(hw):
    ts = np.linspace(1.0, 3.0, 2001)
    al = np.asarray(rates.hw_alpha(hw, jnp.asarray(ts)))
    quad = np.trapezoid(al, ts)
    closed = float(bh.hw_alpha_integral(hw, 1.0, 3.0))
    assert abs(closed - quad) < 5e-6


def test_remaining_swap_value_atm_zero(hw, trade):
    """At the par strike the swap value at T_0 with r = E-ish rate is near
    zero at the forward; more robustly, payer + receiver values negate."""
    sched, K = trade
    x = jnp.linspace(-0.05, 0.05, 11)
    v_p = bh.remaining_swap_value(hw, K, sched, 0, x, payer=True)
    v_r = bh.remaining_swap_value(hw, K, sched, 0, x, payer=False)
    np.testing.assert_allclose(np.asarray(v_p), -np.asarray(v_r), atol=1e-12)
    # payer value increases in x (higher rates -> fixed leg worth less)
    assert np.all(np.diff(np.asarray(v_p)) > 0)


def test_pde_european_collapse(hw, trade):
    sched, K = trade
    euro = float(rates.hw_swaption(hw, K, 1.0, sched[1:]))
    ex = (True,) + (False,) * (len(sched) - 2)
    price, _, _ = bh.bermudan_swaption_pde(hw, K, sched, exercise=ex,
                                           n_x=401, n_sub=24)
    assert abs(float(price) - euro) / euro < 2e-3


def test_mc_european_collapse(hw, trade):
    sched, K = trade
    euro = float(rates.hw_swaption(hw, K, 1.0, sched[1:]))
    ex = (True,) + (False,) * (len(sched) - 2)
    lo, sel, up, seu = bh.bermudan_swaption_mc(
        hw, K, sched, jax.random.PRNGKey(0), exercise=ex,
        n_paths=1 << 14, n_outer=128, n_inner=16)
    # single date: policy is trivial, lower = upper = European (+MC error).
    # The dual martingale is exact here, so g_max collapses to the SCALAR
    # C_0 estimate: se_upper = 0 and the upper inherits the lower's MC
    # error — tolerance must use se_lower for both.
    assert abs(float(lo) - euro) < 4 * float(sel) + 1e-4
    assert abs(float(up) - euro) < 4 * (float(seu) + float(sel)) + 1e-4
    assert abs(float(up) - float(lo)) < 1e-12


def test_bermudan_sandwich(hw, trade):
    """PDE price sits inside (or within noise of) the MC sandwich and
    above the best European."""
    sched, K = trade
    price, _, _ = bh.bermudan_swaption_pde(hw, K, sched, n_x=401, n_sub=16)
    lo, sel, up, seu = bh.bermudan_swaption_mc(
        hw, K, sched, jax.random.PRNGKey(1),
        n_paths=1 << 14, n_outer=128, n_inner=16)
    p = float(price)
    assert p >= float(lo) - 4 * float(sel) - 1e-4
    assert p <= float(up) + 4 * float(seu) + 1e-4
    # duality gap should be small relative to price
    assert float(up - lo) < 0.25 * p
    # best European lower-bounds the Bermudan
    euros = [
        float(rates.hw_swaption(hw, K, float(sched[j]), sched[j + 1:]))
        for j in range(len(sched) - 1)
    ]
    assert p >= max(euros) - 2e-4


def test_bermudan_monotone_in_dates(hw, trade):
    """More exercise rights never decrease the price."""
    sched, K = trade
    m = len(sched) - 1
    ex1 = (True,) + (False,) * (m - 1)
    exall = (True,) * m
    p1, _, _ = bh.bermudan_swaption_pde(hw, K, sched, exercise=ex1,
                                        n_x=301, n_sub=12)
    pa, _, _ = bh.bermudan_swaption_pde(hw, K, sched, exercise=exall,
                                        n_x=301, n_sub=12)
    assert float(pa) >= float(p1) - 1e-6


def test_receiver_payer_parity_direction(hw, trade):
    """Deep-ITM payer Bermudan ~ its intrinsic at T_0; receiver near zero
    (low strike)."""
    sched, _ = trade
    k_low = 0.005
    p, _, _ = bh.bermudan_swaption_pde(hw, k_low, sched, payer=True,
                                       n_x=301, n_sub=12)
    r, _, _ = bh.bermudan_swaption_pde(hw, k_low, sched, payer=False,
                                       n_x=301, n_sub=12)
    assert float(p) > 0.05          # ~ sum of df-weighted (par - K) taus
    assert float(r) < 5e-3
