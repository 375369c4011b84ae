"""Interest-rate family tests (models/rates.py, calibrate/rates.py).

Oracles, all independent of the pricers under test: closed-form identities
(put-call parity, curve reproduction, affine limits), exact-transition
Monte Carlo for the martingale/numeraire pins, and a direct Gauss-Hermite
integration of the terminal bond law for the ZCB option.  Model family
beyond the reference (equity-only models at /root/reference/src/cpp/models/).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.calibrate.rates import HullWhiteCalibrator
from pde_tpu.models import rates
from pde_tpu.models.rates import (
    CIRParams,
    DiscountCurve,
    HullWhiteParams,
    VasicekParams,
    curve_from_zero_rates,
    flat_curve,
)

CURVE = curve_from_zero_rates(
    np.array([0.5, 1.0, 2.0, 3.0, 5.0, 10.0, 30.0]),
    np.array([0.030, 0.032, 0.035, 0.037, 0.040, 0.042, 0.043]),
)
HW = HullWhiteParams(jnp.asarray(0.10), jnp.asarray(0.012), CURVE)
VAS = VasicekParams(jnp.asarray(0.5), jnp.asarray(0.04),
                    jnp.asarray(0.015), jnp.asarray(0.03))
CIR = CIRParams(jnp.asarray(0.5), jnp.asarray(0.04),
                jnp.asarray(0.1), jnp.asarray(0.03))


# -- curve ------------------------------------------------------------------

def test_curve_reproduces_pillars():
    np.testing.assert_allclose(
        np.asarray(CURVE.df(CURVE.times)), np.asarray(CURVE.dfs), rtol=1e-12)


def test_flat_curve_everywhere():
    c = flat_curve(0.05)
    for t in (0.1, 1.0, 7.3, 49.0, 60.0):   # incl. extrapolation region
        assert abs(float(c.df(t)) - np.exp(-0.05 * t)) < 1e-12


def test_forward_rates_consistent():
    f = float(CURVE.forward(1.0, 2.0))
    df_ratio = float(CURVE.df(1.0) / CURVE.df(2.0))
    assert abs(1.0 + f * 1.0 - df_ratio) < 1e-12


def test_inst_forward_matches_segment_slope():
    # flat-forward interpolation: f(0,t) on (1,2) equals the segment forward
    seg = float(-(jnp.log(CURVE.df(2.0)) - jnp.log(CURVE.df(1.0))))
    assert abs(float(CURVE.inst_forward(1.5)) - seg) < 1e-6


# -- Vasicek / CIR ----------------------------------------------------------

def test_vasicek_bond_mc():
    """Closed-form ZCB vs exact-transition MC of e^{-int r}."""
    k, th, sig, r0 = (float(v) for v in VAS)
    T, n_steps, n_paths = 2.0, 256, 1 << 15
    dt = T / n_steps
    e = np.exp(-k * dt)
    sd = sig * np.sqrt((1 - e * e) / (2 * k))
    rng = np.random.default_rng(0)
    r = np.full(n_paths, r0)
    integ = np.zeros(n_paths)
    for _ in range(n_steps):
        r_new = th + (r - th) * e + sd * rng.standard_normal(n_paths)
        integ += 0.5 * (r + r_new) * dt
        r = r_new
    mc = np.mean(np.exp(-integ))
    se = np.std(np.exp(-integ)) / np.sqrt(n_paths)
    cf = float(rates.vasicek_bond(VAS, T))
    assert abs(cf - mc) < 4 * se + 5e-5


def test_vasicek_bond_option_parity():
    call = float(rates.vasicek_bond_option(VAS, 0.9, 1.0, 3.0, is_call=True))
    put = float(rates.vasicek_bond_option(VAS, 0.9, 1.0, 3.0, is_call=False))
    p0 = float(rates.vasicek_bond(VAS, 1.0))
    p1 = float(rates.vasicek_bond(VAS, 3.0))
    assert abs((call - put) - (p1 - 0.9 * p0)) < 1e-12


def test_cir_bond_properties():
    """CIR ZCB: decreasing in maturity, in (0,1), and kappa->large collapses
    to the theta-discount bond."""
    ts = np.array([0.5, 1.0, 2.0, 5.0, 10.0])
    ps = np.asarray(rates.cir_bond(CIR, ts))
    assert np.all(np.diff(ps) < 0)
    assert np.all((ps > 0) & (ps < 1))
    stiff = CIRParams(jnp.asarray(500.0), jnp.asarray(0.04),
                      jnp.asarray(0.1), jnp.asarray(0.03))
    assert abs(float(rates.cir_bond(stiff, 2.0)) - np.exp(-0.04 * 2.0)) < 1e-3


def test_cir_bond_mc():
    k, th, sig, r0 = (float(v) for v in CIR)
    T, n_steps, n_paths = 1.0, 512, 1 << 15
    dt = T / n_steps
    rng = np.random.default_rng(1)
    r = np.full(n_paths, r0)
    integ = np.zeros(n_paths)
    for _ in range(n_steps):   # full-truncation Euler
        rp = np.maximum(r, 0.0)
        r_new = r + k * (th - rp) * dt + sig * np.sqrt(rp * dt) * rng.standard_normal(n_paths)
        integ += 0.5 * (np.maximum(r, 0) + np.maximum(r_new, 0)) * dt
        r = r_new
    mc = np.mean(np.exp(-integ))
    se = np.std(np.exp(-integ)) / np.sqrt(n_paths)
    cf = float(rates.cir_bond(CIR, T))
    assert abs(cf - mc) < 4 * se + 2e-4


# -- Hull-White -------------------------------------------------------------

def test_hw_reproduces_curve():
    """The model must price every market discount factor exactly (the whole
    point of the theta(t) fit)."""
    ts = np.array([0.25, 1.0, 4.0, 12.0])
    np.testing.assert_allclose(
        np.asarray(rates.hw_bond(HW, ts)), np.asarray(CURVE.df(ts)), rtol=1e-12)


def test_hw_bond_reconstruction_consistency():
    """P(0,T) = E[e^{-int_0^t r} P(t,T|r_t)] — check the affine
    reconstruction against the simulated factor at an interior date."""
    T0, T1 = 1.0, 4.0
    r_path, int_r = rates.hw_simulate(HW, T0, jax.random.PRNGKey(2),
                                      n_steps=256, n_paths=1 << 15)
    r_T0 = np.asarray(r_path[-1])
    disc = np.exp(-np.asarray(int_r))
    pv = disc * np.asarray(rates.hw_bond(HW, T1, T0, jnp.asarray(r_T0)))
    se = pv.std() / np.sqrt(pv.size)
    assert abs(pv.mean() - float(CURVE.df(T1))) < 4 * se + 3e-5


def test_hw_martingale():
    """E[e^{-int_0^T r}] = P(0,T) under the exact-transition simulation."""
    T = 3.0
    _, int_r = rates.hw_simulate(HW, T, jax.random.PRNGKey(3),
                                 n_steps=384, n_paths=1 << 15)
    disc = np.exp(-np.asarray(int_r))
    se = disc.std() / np.sqrt(disc.size)
    assert abs(disc.mean() - float(CURVE.df(T))) < 4 * se + 5e-5


def test_hw_bond_option_vs_mc():
    """ZCB call vs simulation: price P(T0,T1|r) at expiry off the simulated
    factor and discount along the path."""
    T0, T1, K = 1.0, 3.0, 0.92
    r_path, int_r = rates.hw_simulate(HW, T0, jax.random.PRNGKey(4),
                                      n_steps=256, n_paths=1 << 16)
    r_T0 = jnp.asarray(np.asarray(r_path[-1]))
    bonds = np.asarray(rates.hw_bond(HW, T1, T0, r_T0))
    payoff = np.exp(-np.asarray(int_r)) * np.maximum(bonds - K, 0.0)
    se = payoff.std() / np.sqrt(payoff.size)
    cf = float(rates.hw_bond_option(HW, K, T0, T1, is_call=True))
    assert abs(cf - payoff.mean()) < 4 * se + 5e-5


def test_hw_caplet_replication():
    """Caplet == (1 + tau K) ZCB puts struck at 1/(1+tau K), and positive,
    increasing in sigma."""
    c = float(rates.hw_caplet(HW, 0.04, 1.0, 1.5))
    assert c > 0
    hi = HullWhiteParams(HW.a, HW.sigma * 2, CURVE)
    assert float(rates.hw_caplet(hi, 0.04, 1.0, 1.5)) > c
    tau, K = 0.5, 0.04
    kb = 1.0 / (1.0 + tau * K)
    put = float(rates.hw_bond_option(HW, kb, 1.0, 1.5, is_call=False))
    assert abs(c - (1.0 + tau * K) * put) < 1e-14


def test_hw_caplet_vs_mc():
    """Caplet closed form vs MC: simulate to the reset date, read the
    simply-compounded forward off the affine bond, pay at the end date."""
    start, end, K = 1.0, 1.5, 0.04
    tau = end - start
    r_path, int_r = rates.hw_simulate(HW, start, jax.random.PRNGKey(5),
                                      n_steps=256, n_paths=1 << 16)
    r_T = jnp.asarray(np.asarray(r_path[-1]))
    p = np.asarray(rates.hw_bond(HW, end, start, r_T))
    fwd = (1.0 / p - 1.0) / tau
    payoff = (np.exp(-np.asarray(int_r)) * p * tau
              * np.maximum(fwd - K, 0.0))
    se = payoff.std() / np.sqrt(payoff.size)
    cf = float(rates.hw_caplet(HW, K, start, end))
    assert abs(cf - payoff.mean()) < 4 * se + 5e-5


def test_hw_cap_is_caplet_sum():
    pay = np.array([1.0, 1.5, 2.0, 2.5])
    K = 0.04
    cf = float(rates.hw_cap(HW, K, pay))
    parts = sum(float(rates.hw_caplet(HW, K, s, e))
                for s, e in zip(pay[:-1], pay[1:]))
    assert abs(cf - parts) < 1e-12


def test_hw_swaption_vs_mc():
    """Jamshidian swaption vs direct MC of the swap value at expiry."""
    expiry, K = 1.0, 0.04
    pay = np.array([1.5, 2.0, 2.5, 3.0])
    cf = float(rates.hw_swaption(HW, K, expiry, pay, payer=True))
    r_path, int_r = rates.hw_simulate(HW, expiry, jax.random.PRNGKey(6),
                                      n_steps=256, n_paths=1 << 16)
    r_T = jnp.asarray(np.asarray(r_path[-1]))
    taus = np.diff(np.concatenate([[expiry], pay]))
    bonds = np.asarray(rates.hw_bond(HW, jnp.asarray(pay)[:, None],
                                     expiry, r_T))       # (4, paths)
    annuity = (taus[:, None] * bonds).sum(axis=0)
    swap = (1.0 - bonds[-1]) - K * annuity   # payer swap value at expiry
    payoff = np.exp(-np.asarray(int_r)) * np.maximum(swap, 0.0)
    se = payoff.std() / np.sqrt(payoff.size)
    assert abs(cf - payoff.mean()) < 4 * se + 1e-4


def test_hw_swaption_parity_at_par():
    """Payer == receiver at the par strike (swaption parity)."""
    expiry = 1.0
    pay = jnp.asarray([1.5, 2.0, 2.5, 3.0])
    par = float(rates.hw_swap_rate(CURVE, expiry, pay))
    payer = float(rates.hw_swaption(HW, par, expiry, pay, payer=True))
    recv = float(rates.hw_swaption(HW, par, expiry, pay, payer=False))
    assert abs(payer - recv) < 1e-10
    assert payer > 0


def test_hw_zero_vol_limits():
    """sigma -> 0: caplet collapses to the discounted intrinsic on the
    forward; swaption to the intrinsic swap value."""
    tiny = HullWhiteParams(HW.a, jnp.asarray(1e-8), CURVE)
    f = float(CURVE.forward(1.0, 1.5))
    for K in (f - 0.01, f + 0.01):
        c = float(rates.hw_caplet(tiny, K, 1.0, 1.5))
        intr = float(CURVE.df(1.5)) * 0.5 * max(f - K, 0.0)
        assert abs(c - intr) < 1e-7


# -- calibration ------------------------------------------------------------

def test_calibrate_caplets_recovers_params():
    a_true, sig_true = 0.08, 0.015
    truth = HullWhiteParams(jnp.asarray(a_true), jnp.asarray(sig_true), CURVE)
    starts = np.array([0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 7.0])
    ends = starts + 0.5
    strikes = np.asarray(CURVE.forward(starts, ends))  # ATM strip
    quotes = np.asarray(rates.hw_caplet(truth, strikes, starts, ends))
    res = HullWhiteCalibrator().calibrate_caplets(
        CURVE, starts, ends, strikes, quotes)
    assert res.rmse < 1e-8
    assert abs(float(res.params.a) - a_true) < 1e-4
    assert abs(float(res.params.sigma) - sig_true) < 1e-6


def test_calibrate_swaptions_recovers_params():
    a_true, sig_true = 0.12, 0.010
    truth = HullWhiteParams(jnp.asarray(a_true), jnp.asarray(sig_true), CURVE)
    expiries = [1.0, 2.0, 3.0]
    pay_times = [np.arange(e + 0.5, e + 3.01, 0.5) for e in expiries]
    strikes = [float(rates.hw_swap_rate(CURVE, e, jnp.asarray(pt)))
               for e, pt in zip(expiries, pay_times)]
    quotes = np.array([
        float(rates.hw_swaption(truth, k, e, jnp.asarray(pt)))
        for e, pt, k in zip(expiries, pay_times, strikes)
    ])
    res = HullWhiteCalibrator().calibrate_swaptions(
        CURVE, expiries, pay_times, strikes, quotes)
    assert res.rmse < 1e-7
    assert abs(float(res.params.a) - a_true) < 2e-3
    assert abs(float(res.params.sigma) - sig_true) < 1e-5


def test_validate():
    with pytest.raises(ValueError):
        HullWhiteParams(jnp.asarray(-0.1), jnp.asarray(0.01), CURVE).validate()
    with pytest.raises(ValueError):
        VasicekParams(jnp.asarray(0.5), jnp.asarray(0.04),
                      jnp.asarray(-1.0), jnp.asarray(0.03)).validate()


def test_bachelier_roundtrip():
    """Price -> implied normal vol -> price round trip, across moneyness
    and option type."""
    from pde_tpu.models.rates import bachelier_implied_vol, bachelier_price
    f, T, ann = 0.03, 2.0, 4.2
    for k in (0.01, 0.025, 0.03, 0.035, 0.06):
        for is_call in (True, False):
            p = float(bachelier_price(f, k, 0.0075, T, ann, is_call))
            iv = float(bachelier_implied_vol(p, f, k, T, ann, is_call))
            assert abs(iv - 0.0075) < 1e-8, (k, is_call, iv)


def test_bachelier_quotes_hw_swaption():
    """Quote a Jamshidian swaption in normal vol: the implied vol must be
    positive, ~sigma/B-scale, and reprice exactly."""
    from pde_tpu.models.rates import bachelier_implied_vol, bachelier_price
    curve = rates.curve_from_zero_rates(
        jnp.array([1.0, 5.0, 10.0]), jnp.array([0.03, 0.04, 0.042]))
    hw = rates.HullWhiteParams(jnp.asarray(0.1), jnp.asarray(0.012), curve)
    expiry = 1.0
    pay = jnp.arange(1.5, 4.01, 0.5)
    K = float(rates.hw_swap_rate(curve, expiry, pay))
    price = float(rates.hw_swaption(hw, K, expiry, pay))
    taus = np.diff(np.concatenate([[expiry], np.asarray(pay)]))
    annuity = float(np.sum(taus * np.asarray(curve.df(pay))))
    iv = float(bachelier_implied_vol(price, K, K, expiry, annuity))
    assert 0.001 < iv < 0.05
    re = float(bachelier_price(K, K, iv, expiry, annuity))
    assert abs(re - price) < 1e-10


class TestBlackCapletStripping:
    """Black-76 cap quoting + the flat-to-forward caplet vol strip
    (models/rates.py; closes the quote-to-calibration loop the HW
    calibrator's price-space objective requires)."""

    @pytest.fixture(scope="class")
    def curve(self):
        from pde_tpu.models.rates import curve_from_zero_rates

        return curve_from_zero_rates(
            jnp.asarray([0.5, 1.0, 2.0, 5.0, 10.0, 30.0]),
            jnp.asarray([0.030, 0.032, 0.035, 0.040, 0.042, 0.043]))

    def test_black_caplet_monotone_in_vol_and_positive(self, curve):
        from pde_tpu.models.rates import black_caplet_price

        k = float(curve.forward(1.0, 1.25))
        lo = float(black_caplet_price(curve, k, 1.0, 1.25, 0.10))
        hi = float(black_caplet_price(curve, k, 1.0, 1.25, 0.30))
        assert 0.0 < lo < hi

    def test_cap_is_caplet_sum(self, curve):
        from pde_tpu.models.rates import (black_cap_price,
                                          black_caplet_price)

        starts = np.arange(0.25, 2.0 - 1e-9, 0.25)
        total = sum(
            float(black_caplet_price(curve, 0.035, s, s + 0.25, 0.2))
            for s in starts)
        cap = float(black_cap_price(curve, 0.035, 2.0, 0.2))
        np.testing.assert_allclose(cap, total, rtol=1e-12)

    def test_flat_vol_strips_to_flat_forward_vols(self, curve):
        """All caps quoted at the SAME flat vol -> every forward caplet
        vol equals it (the strip's exactness pin)."""
        from pde_tpu.models.rates import strip_caplet_vols

        mats = [1.0, 2.0, 3.0, 5.0]
        vols = jnp.full(4, 0.22)
        starts, ends, fwd = strip_caplet_vols(curve, 0.035, mats, vols)
        np.testing.assert_allclose(np.asarray(fwd), 0.22, rtol=1e-8)

    def test_strip_reprices_every_cap_exactly(self, curve):
        """The stripped forward vols must reprice each cap at its own
        flat vol — pricer-consistent by construction."""
        from pde_tpu.models.rates import (black_cap_price,
                                          black_caplet_price,
                                          strip_caplet_vols)

        mats = [1.0, 2.0, 3.0, 5.0]
        vols = jnp.asarray([0.26, 0.24, 0.22, 0.20])  # downward sloping
        starts, ends, fwd = strip_caplet_vols(curve, 0.035, mats, vols)
        s_np = np.asarray(starts)
        for i, m in enumerate(mats):
            quoted = float(black_cap_price(curve, 0.035, m, vols[i]))
            mask = s_np < m - 1e-9
            stripped = float(jnp.sum(jnp.where(
                jnp.asarray(mask),
                black_caplet_price(curve, 0.035, starts, ends, fwd), 0.0)))
            np.testing.assert_allclose(stripped, quoted, rtol=1e-9)
        # forward vols decline like the quotes but steeper at the long end
        fwd_np = np.asarray(fwd)
        assert fwd_np[-1] < fwd_np[0]

    def test_strip_feeds_hw_calibration(self, curve):
        """End-to-end: flat cap vols -> strip -> caplet prices -> HW
        (a, sigma) fit; the fitted model must reprice the caplet strip
        within the LM's convergence tolerance."""
        from pde_tpu.calibrate.rates import HullWhiteCalibrator
        from pde_tpu.models.rates import (black_caplet_price,
                                          strip_caplet_vols, hw_caplet)

        mats = [1.0, 2.0, 3.0]
        vols = jnp.asarray([0.25, 0.23, 0.215])
        k = 0.036
        starts, ends, fwd = strip_caplet_vols(curve, k, mats, vols)
        prices = black_caplet_price(curve, k, starts, ends, fwd)
        res = HullWhiteCalibrator(max_iter=60).calibrate_caplets(
            curve, starts, ends, jnp.full(starts.shape, k), prices)
        # one-factor HW cannot match an arbitrary vol slope exactly;
        # a few percent max relative price error is the usual fit
        assert res.rmse < 0.05, res
        model = np.asarray(hw_caplet(
            res.params, k, starts, ends))
        assert np.all(model > 0)
