"""Credit tests: CDS identities, bootstrap round-trip (exact by
construction), and the CVA closed-form-vs-MC pin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import credit, rates


@pytest.fixture(scope="module")
def curve():
    return rates.curve_from_zero_rates(
        jnp.array([0.5, 1.0, 2.0, 5.0, 10.0, 30.0]),
        jnp.array([0.030, 0.032, 0.035, 0.040, 0.042, 0.043]))


@pytest.fixture(scope="module")
def hw(curve):
    return rates.HullWhiteParams(
        jnp.asarray(0.1), jnp.asarray(0.012), curve)


def test_flat_hazard_par_spread_credit_triangle(curve):
    """s ~ (1-R) lambda — the credit triangle, exact for continuous
    premium, within ~1% for quarterly."""
    for lam in (0.005, 0.02, 0.08):
        hz = credit.flat_hazard(lam)
        s = float(credit.cds_par_spread(curve, hz, 5.0, recovery=0.4))
        assert abs(s / (0.6 * lam) - 1.0) < 0.02


def test_survival_monotone_and_hazard_readback():
    hz = credit.flat_hazard(0.03)
    ts = jnp.linspace(0.1, 20.0, 50)
    q = np.asarray(hz.q(ts))
    assert np.all(np.diff(q) < 0) and np.all(q > 0) and q[0] < 1.0
    lam = np.asarray(hz.hazard(jnp.array([1.0, 5.0, 15.0])))
    np.testing.assert_allclose(lam, 0.03, rtol=1e-6)


def test_cds_value_zero_at_par(curve):
    hz = credit.flat_hazard(0.02)
    s_par = credit.cds_par_spread(curve, hz, 5.0)
    v = float(credit.cds_value(curve, hz, 5.0, s_par))
    assert abs(v) < 1e-14
    # buyer gains when paying less than par
    assert float(credit.cds_value(curve, hz, 5.0, 0.5 * s_par)) > 0


def test_bootstrap_roundtrip_exact(curve):
    """The bootstrap solves against the SAME pricer: repricing the pillar
    CDS must recover the input spreads to Newton tolerance."""
    pillars = jnp.array([1.0, 3.0, 5.0, 7.0, 10.0])
    spreads = jnp.array([0.008, 0.011, 0.013, 0.014, 0.015])
    hc, hs = credit.bootstrap_hazard(curve, pillars, spreads)
    assert np.all(np.asarray(hs) > 0)
    for t, s in zip(np.asarray(pillars), np.asarray(spreads)):
        r = float(credit.cds_par_spread(curve, hc, float(t)))
        assert abs(r / float(s) - 1.0) < 1e-10


def test_par_spread_strip_matches_scalar_calls(curve):
    """cds_par_spreads (one jitted program per pillar grid) must equal
    the per-maturity scalar calls exactly."""
    hz = credit.flat_hazard(0.02)
    mats = [1.0, 3.0, 5.0, 10.0]
    strip = np.asarray(credit.cds_par_spreads(curve, hz, mats))
    singles = np.asarray([
        float(credit.cds_par_spread(curve, hz, m)) for m in mats])
    np.testing.assert_allclose(strip, singles, rtol=1e-12)


def test_cds_broken_maturity_schedule_tiles_exactly(curve):
    """Maturity NOT a multiple of freq (4.9y, quarterly): the schedule
    snaps to n_pay equal periods whose accruals tile [0, T] exactly, so
    the par spread sits between the 4.75y and 5.0y par spreads and the
    credit triangle still holds to the usual tolerance."""
    hz = credit.flat_hazard(0.02)
    s_lo = float(credit.cds_par_spread(curve, hz, 4.75))
    s_hi = float(credit.cds_par_spread(curve, hz, 5.0))
    s_mid = float(credit.cds_par_spread(curve, hz, 4.9))
    lo, hi = sorted((s_lo, s_hi))
    assert lo - 1e-6 <= s_mid <= hi + 1e-6
    assert abs(s_mid / (0.6 * 0.02) - 1.0) < 0.02


def test_bootstrap_traced_spreads_under_jit_and_grad(curve):
    """Spreads may be tracers: the docstring promise.  jit + grad of the
    bootstrapped 5y hazard w.r.t. the input spreads must run and give a
    positive sensitivity for the matching pillar."""
    pillars = jnp.array([1.0, 5.0])

    def h5(spreads):
        _, hs = credit.bootstrap_hazard(curve, pillars, spreads)
        return hs[1]

    spreads = jnp.array([0.008, 0.013])
    v = jax.jit(h5)(spreads)
    assert float(v) > 0
    g = jax.grad(h5)(spreads)
    assert float(g[1]) > 0  # wider 5y spread -> higher 5y hazard


def test_bootstrap_flat_input_gives_flat_hazard(curve):
    """Flat par spreads across pillars -> near-flat hazards."""
    pillars = jnp.array([2.0, 5.0, 10.0])
    hz_true = credit.flat_hazard(0.025)
    spreads = jnp.asarray([
        float(credit.cds_par_spread(curve, hz_true, float(t)))
        for t in pillars
    ])
    _, hs = credit.bootstrap_hazard(curve, pillars, spreads)
    np.testing.assert_allclose(np.asarray(hs), 0.025, rtol=2e-3)


def test_cva_positive_and_scales_with_risk(hw):
    sched = jnp.arange(0.5, 5.01, 0.5)
    K = float(rates.hw_swap_rate(hw.curve, 0.5, sched[1:]))
    cva_lo = float(credit.cva_swap_hw(hw, credit.flat_hazard(0.005), K, sched))
    cva_hi = float(credit.cva_swap_hw(hw, credit.flat_hazard(0.05), K, sched))
    assert 0 < cva_lo < cva_hi
    # riskless counterparty -> no CVA
    cva_0 = float(credit.cva_swap_hw(hw, credit.flat_hazard(1e-12), K, sched))
    assert cva_0 < 1e-12


def test_cva_netting_single_swap_matches_closed_form(hw):
    """One-swap netting set: MC EE must reproduce the Jamshidian-strip
    closed form to MC error."""
    sched = jnp.arange(0.5, 4.01, 0.5)
    K = float(rates.hw_swap_rate(hw.curve, 0.5, sched[1:]))
    hz = credit.flat_hazard(0.02)
    cf = float(credit.cva_swap_hw(hw, hz, K, sched))
    trade = credit.SwapTrade(jnp.asarray(K), jnp.asarray(1.0),
                             jnp.asarray(1.0))
    cva_mc, ee, se = credit.cva_netting_hw_mc(
        hw, hz, [trade], sched, jax.random.PRNGKey(0), n_paths=1 << 14)
    assert abs(float(cva_mc) / cf - 1.0) < 0.05
    # each EE date: the European swaption value, within 5 se
    for j in range(len(sched) - 1):
        sw = float(rates.hw_swaption(hw, K, float(sched[j]), sched[j + 1:]))
        assert abs(float(ee[j]) - sw) < 5 * float(se[j]) + 1e-6


def test_cva_netting_offsetting_trades_zero(hw):
    sched = jnp.arange(0.5, 3.01, 0.5)
    K = float(rates.hw_swap_rate(hw.curve, 0.5, sched[1:]))
    trades = [
        credit.SwapTrade(jnp.asarray(K), jnp.asarray(1.0), jnp.asarray(1.0)),
        credit.SwapTrade(jnp.asarray(K), jnp.asarray(-1.0), jnp.asarray(1.0)),
    ]
    cva, ee, _ = credit.cva_netting_hw_mc(
        hw, credit.flat_hazard(0.02), trades, sched,
        jax.random.PRNGKey(1), n_paths=1 << 12)
    assert float(cva) == 0.0
    assert float(jnp.max(jnp.abs(ee))) == 0.0


def test_cva_netting_beats_gross(hw):
    """Netting a payer with an out-of-the-money receiver cannot increase
    CVA vs the payer alone."""
    sched = jnp.arange(0.5, 3.01, 0.5)
    K = float(rates.hw_swap_rate(hw.curve, 0.5, sched[1:]))
    hz = credit.flat_hazard(0.02)
    payer = credit.SwapTrade(jnp.asarray(K), jnp.asarray(1.0),
                             jnp.asarray(1.0))
    recv = credit.SwapTrade(jnp.asarray(K * 0.8), jnp.asarray(-1.0),
                            jnp.asarray(0.5))
    cva_p, _, _ = credit.cva_netting_hw_mc(
        hw, hz, [payer], sched, jax.random.PRNGKey(2), n_paths=1 << 13)
    cva_n, _, _ = credit.cva_netting_hw_mc(
        hw, hz, [payer, recv], sched, jax.random.PRNGKey(2),
        n_paths=1 << 13)
    assert float(cva_n) <= float(cva_p) + 1e-10
