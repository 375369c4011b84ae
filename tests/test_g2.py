"""G2++ tests: closed-form identities (exact), MC pins (statistical),
the Hull-White degenerate limit, calibration round-trip, and the Bermudan
sandwich."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.calibrate.g2 import G2Calibrator
from pde_tpu.models import g2, rates
from pde_tpu.solvers.bermudan_g2 import (
    bermudan_swaption_g2_mc, remaining_swap_value_g2,
)


@pytest.fixture(scope="module")
def curve():
    return rates.curve_from_zero_rates(
        jnp.array([0.5, 1.0, 2.0, 5.0, 10.0, 30.0]),
        jnp.array([0.030, 0.032, 0.035, 0.040, 0.042, 0.043]))


@pytest.fixture(scope="module")
def params(curve):
    return g2.G2Params(
        jnp.asarray(0.5), jnp.asarray(0.05), jnp.asarray(0.01),
        jnp.asarray(0.008), jnp.asarray(-0.6), curve).validate()


def test_bond_at_zero_reproduces_curve(params, curve):
    ts = jnp.array([0.5, 1.0, 7.3, 25.0])
    np.testing.assert_allclose(
        np.asarray(g2.g2_bond(params, ts)), np.asarray(curve.df(ts)),
        rtol=1e-14)


def test_exact_martingale_identity(params, curve):
    """-int phi + Var(S)/2 = log P(0,T): the money-market expectation
    reproduces the curve in EXACT arithmetic (no simulation involved)."""
    for T in (0.7, 3.0, 12.0):
        _, cov = g2.g2_joint_increment_moments(params, T)
        A = g2.g2_phi_integral(params, 0.0, T)
        assert abs(float(-A + 0.5 * cov[2, 2])
                   - float(jnp.log(curve.df(T)))) < 1e-12


def test_phi_integral_vs_quadrature(params):
    a, b = 1.0, 4.0
    ts = np.linspace(a, b, 4001)
    sig, eta, rho = (float(params.sigma), float(params.eta),
                     float(params.rho))
    aa, bb = float(params.a), float(params.b)
    ba = (1.0 - np.exp(-aa * ts)) / aa
    bbv = (1.0 - np.exp(-bb * ts)) / bb
    # f(0,t) part via the curve's own inst_forward
    f0 = np.asarray(params.curve.inst_forward(jnp.asarray(ts)))
    phi = f0 + 0.5 * sig**2 * ba**2 + 0.5 * eta**2 * bbv**2 \
        + rho * sig * eta * ba * bbv
    quad = np.trapezoid(phi, ts)
    assert abs(float(g2.g2_phi_integral(params, a, b)) - quad) < 5e-5


def test_simulated_discount_matches_curve(params, curve):
    _, _, logds = g2.g2_simulate(
        params, jnp.array([1.0, 5.0]), jax.random.PRNGKey(0),
        n_paths=1 << 15)
    for j, T in enumerate([1.0, 5.0]):
        d = jnp.exp(logds[j])
        se = float(jnp.std(d)) / np.sqrt(d.shape[0])
        assert abs(float(jnp.mean(d)) - float(curve.df(T))) < 5 * se


def test_zcb_option_parity(params, curve):
    K, T0, T1 = 0.9, 1.0, 3.0
    call = float(g2.g2_zcb_option(params, K, T0, T1, is_call=True))
    put = float(g2.g2_zcb_option(params, K, T0, T1, is_call=False))
    fwd = float(curve.df(T1)) - K * float(curve.df(T0))
    assert abs(call - put - fwd) < 1e-14
    assert call > 0 and put > 0


def test_caplet_decreasing_in_strike(params):
    ks = jnp.array([0.01, 0.03, 0.05, 0.08])
    vals = np.asarray(g2.g2_caplet(params, ks, 1.0, 1.5))
    assert np.all(np.diff(vals) < 0)
    assert np.all(vals > 0)


def test_swaption_single_payment_equals_zcb_put(params):
    """One fixed payment: the swaption IS a ZCB option — pins the whole
    Gauss-Hermite + Newton machinery to the closed form."""
    K, T0, T1 = 0.04, 1.0, 2.0
    tau = T1 - T0
    sw = float(g2.g2_swaption(params, K, T0, jnp.array([T1]), payer=True))
    kb = 1.0 / (1.0 + tau * K)
    rep = float(
        (1.0 + tau * K) * g2.g2_zcb_option(params, kb, T0, T1,
                                           is_call=False))
    assert abs(sw / rep - 1.0) < 1e-10


def test_swaption_payer_receiver_parity(params, curve):
    sched = jnp.arange(1.0, 5.01, 0.5)
    pay = sched[1:]
    K = 0.035
    pp = float(g2.g2_swaption(params, K, 1.0, pay, payer=True))
    rr = float(g2.g2_swaption(params, K, 1.0, pay, payer=False))
    taus = np.diff(np.asarray(sched))
    c = taus * K
    c[-1] += 1.0
    fwd = float(curve.df(1.0)) - float(np.sum(c * np.asarray(curve.df(pay))))
    assert abs((pp - rr) - fwd) < 1e-12


def test_swaption_hw_degenerate_limit(curve):
    """eta -> 0 reduces G2++ to Hull-White(a, sigma).  The integrand
    degenerates to a step in x, so GH converges slowly — use 256 nodes
    and a 2e-3 relative tolerance (64-node error ~6e-3, documented)."""
    sched = jnp.arange(1.0, 5.01, 0.5)
    pay = sched[1:]
    K = float(rates.hw_swap_rate(curve, 1.0, pay))
    deg = g2.G2Params(jnp.asarray(0.1), jnp.asarray(1.0), jnp.asarray(0.012),
                      jnp.asarray(1e-6), jnp.asarray(0.0), curve)
    hwp = rates.HullWhiteParams(jnp.asarray(0.1), jnp.asarray(0.012), curve)
    gp = float(g2.g2_swaption(deg, K, 1.0, pay, payer=True, n_gh=256))
    hp = float(rates.hw_swaption(hwp, K, 1.0, pay, payer=True))
    assert abs(gp / hp - 1.0) < 2e-3


def test_swaption_vs_direct_mc(params):
    """The GH formula against brute-force exact-transition MC."""
    sched = jnp.arange(1.0, 5.01, 0.5)
    pay = sched[1:]
    K = float(rates.hw_swap_rate(params.curve, 1.0, pay))
    gh = float(g2.g2_swaption(params, K, 1.0, pay, payer=True))
    xs, ys, lds = g2.g2_simulate(
        params, jnp.array([1.0]), jax.random.PRNGKey(3), n_paths=1 << 16)
    taus = np.diff(np.asarray(sched))
    c = jnp.asarray(np.concatenate([taus[:-1] * K, [taus[-1] * K + 1.0]]))
    bonds = g2.g2_bond(params, pay, 1.0, xs[0][:, None], ys[0][:, None])
    po = jnp.exp(lds[0]) * jnp.maximum(1.0 - jnp.sum(c * bonds, -1), 0.0)
    se = float(jnp.std(po)) / np.sqrt(po.shape[0])
    assert abs(float(jnp.mean(po)) - gh) < 5 * se


def test_swaption_grad_finite(params):
    """The calibrator needs gradients through Newton + GH: check they are
    finite and match finite differences."""
    pay = jnp.arange(1.5, 4.01, 0.5)

    def price(sig):
        p = params._replace(sigma=sig)
        return g2.g2_swaption(p, 0.035, 1.0, pay, payer=True)

    g = float(jax.grad(price)(jnp.asarray(0.01)))
    eps = 1e-6
    fd = (float(price(jnp.asarray(0.01 + eps)))
          - float(price(jnp.asarray(0.01 - eps)))) / (2 * eps)
    assert np.isfinite(g)
    assert abs(g - fd) < 1e-4 * max(1.0, abs(fd))


def test_calibration_roundtrip(params, curve):
    """Prices from known params must be refit to ~machine precision (the
    5-parameter vector itself is under-identified by a small panel — the
    fit target is price RMSE, as in the reference's calibrators)."""
    exps = [1.0, 2.0, 3.0]
    pts = [jnp.arange(e + 0.5, e + 3.01, 0.5) for e in exps]
    ks = [float(rates.hw_swap_rate(curve, e, pt))
          for e, pt in zip(exps, pts)]
    quotes = jnp.asarray([
        float(g2.g2_swaption(params, k, e, pt))
        for e, pt, k in zip(exps, pts, ks)
    ])
    res = G2Calibrator(max_iter=60).calibrate_swaptions(
        curve, exps, pts, ks, quotes)
    assert res.converged
    assert res.rmse < 1e-8


def test_remaining_swap_value_signs(params):
    sched = jnp.arange(1.0, 4.01, 0.5)
    K = 0.035
    x = jnp.linspace(-0.04, 0.04, 9)
    y = jnp.zeros_like(x)
    vp = np.asarray(remaining_swap_value_g2(params, K, sched, 0, x, y, True))
    vr = np.asarray(remaining_swap_value_g2(params, K, sched, 0, x, y, False))
    np.testing.assert_allclose(vp, -vr, atol=1e-14)
    assert np.all(np.diff(vp) > 0)      # payer gains as rates rise


def test_bermudan_single_date_collapse(params):
    sched = jnp.arange(1.0, 4.01, 0.5)
    K = float(rates.hw_swap_rate(params.curve, 1.0, sched[1:]))
    euro = float(g2.g2_swaption(params, K, 1.0, sched[1:], payer=True))
    ex = (True,) + (False,) * (len(sched) - 2)
    lo, sel, up, seu = bermudan_swaption_g2_mc(
        params, K, sched, jax.random.PRNGKey(0), exercise=ex,
        n_paths=1 << 13, n_outer=64, n_inner=8)
    assert abs(float(lo) - euro) < 4 * float(sel) + 2e-4
    assert abs(float(up) - float(lo)) < 1e-12      # trivial policy: dual exact


def test_bermudan_sandwich_dominates_european(params):
    sched = jnp.arange(1.0, 4.01, 0.5)
    K = float(rates.hw_swap_rate(params.curve, 1.0, sched[1:]))
    lo, sel, up, seu = bermudan_swaption_g2_mc(
        params, K, sched, jax.random.PRNGKey(1),
        n_paths=1 << 13, n_outer=64, n_inner=8)
    euros = [
        float(g2.g2_swaption(params, K, float(sched[j]), sched[j + 1:]))
        for j in range(len(sched) - 1)
    ]
    assert float(lo) >= max(euros) - 4 * float(sel) - 1e-4
    assert float(up) >= float(lo) - 1e-12
    assert float(up - lo) < 0.3 * float(lo) + 4 * (float(sel) + float(seu))
