"""Digital and touch options (models/digital.py, black_scholes digitals,
heston_mc MC twins).

Cross-check lattice:
  * Gil-Pelaez digitals vs the Black-Scholes closed form in the
    deterministic-variance limit (sigma -> 0, v0 = theta),
  * put-call digital parity and the European decomposition
    C = asset_call - K * cash_call against the converged vanilla pricer,
  * MC digitals vs the semi-analytic prices,
  * bridge-corrected one-touch MC vs the reflection-principle closed form,
  * Bates digitals through the affine cf_reduced_extra hook.

The reference platform has no digital pricer; these contracts extend its
CF/quadrature machinery (src/cpp/models/heston.cpp:94-151).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import black_scholes as bsm
from pde_tpu.models import digital
from pde_tpu.models import heston
from pde_tpu.models import heston_mc as mc
from pde_tpu.models.bates import BatesParams
from pde_tpu.models.heston import HestonParams

P = HestonParams(2.0, 0.04, 0.5, -0.7, 0.04)
# sigma -> 0, v0 = theta: variance is constant at v0, Heston == BS(sqrt(v0)).
# sigma = 1e-3 (not smaller): (xi - d) in the CF is O(sigma^2), so tinier
# sigmas trade model error for catastrophic-cancellation error; at 1e-3 the
# model gap is O(sigma^2) ~ 1e-6 and the cancellation noise ~ 1e-10.
DET = HestonParams(2.0, 0.04, 1e-3, 0.0, 0.04)
R, Q = 0.05, 0.02
KS = jnp.asarray([80.0, 95.0, 100.0, 105.0, 120.0])


def test_bs_limit_cash_and_asset():
    for kind in ("cash", "asset"):
        for is_call in (True, False):
            got = digital.price(DET, KS, 1.0, 100.0, R, Q,
                                is_call=is_call, kind=kind)
            want = bsm.digital_price(100.0, KS, R, Q, 1.0, 0.2,
                                     is_call=is_call, kind=kind)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
                err_msg=f"{kind} is_call={is_call}",
            )


def test_bs_limit_short_maturity_low_variance():
    """Short-T / low-variance truncation (ADVICE r2): the Gil-Pelaez
    integrand decays one power of u slower than Carr-Madan's, so the
    composite rule's [0, 204.8] truncation loses ~4e-4 of probability at
    T = 0.02, v0 = 0.01 without the per-contract quadrature stretch
    (digital._tail_scale); with it the BS deterministic-variance limit is
    matched to ~1e-7 on the cash contract."""
    det = HestonParams(2.0, 0.01, 1e-3, 0.0, 0.01)  # v0 = theta = 0.01
    ks = jnp.asarray([97.0, 99.0, 100.0, 101.0, 103.0])
    for T in (0.02, 0.05):
        for kind, tol in (("cash", 1e-6), ("asset", 2e-5)):
            got = digital.price(det, ks, T, 100.0, R, Q,
                                is_call=True, kind=kind)
            want = bsm.digital_price(100.0, ks, R, Q, T, 0.1,
                                     is_call=True, kind=kind)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=tol,
                err_msg=f"T={T} {kind}",
            )


def test_prices_from_probs_matches_price():
    # one probabilities() pass must reproduce both kinds of price() exactly
    p1, p2 = digital.probabilities(P, KS, 1.0, 100.0, R, Q)
    for is_call in (True, False):
        cash, asset = digital.prices_from_probs(
            p1, p2, KS, 1.0, 100.0, R, Q, is_call=is_call)
        np.testing.assert_allclose(
            np.asarray(cash),
            np.asarray(digital.price(P, KS, 1.0, 100.0, R, Q,
                                     is_call=is_call, kind="cash")),
            rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(asset),
            np.asarray(digital.price(P, KS, 1.0, 100.0, R, Q,
                                     is_call=is_call, kind="asset")),
            rtol=1e-12)


def test_put_call_digital_parity():
    # cash call + cash put = e^{-rT}; asset call + asset put = S e^{-qT}
    for T in (0.25, 1.0, 2.0):
        c = digital.price(P, KS, T, 100.0, R, Q, is_call=True, kind="cash")
        p = digital.price(P, KS, T, 100.0, R, Q, is_call=False, kind="cash")
        np.testing.assert_allclose(
            np.asarray(c + p), np.exp(-R * T) * np.ones(len(KS)), atol=1e-10
        )
        ac = digital.price(P, KS, T, 100.0, R, Q, is_call=True, kind="asset")
        ap = digital.price(P, KS, T, 100.0, R, Q, is_call=False, kind="asset")
        np.testing.assert_allclose(
            np.asarray(ac + ap), 100.0 * np.exp(-Q * T) * np.ones(len(KS)),
            atol=1e-8,
        )


def test_european_decomposition_matches_vanilla():
    # C = asset_call - K * cash_call must agree with the converged
    # Carr-Madan pricer (different contour, different inversion formula)
    for is_call in (True, False):
        assembled = digital.european_from_digitals(
            P, KS, 1.0, 100.0, R, Q, is_call=is_call
        )
        vanilla = heston.price_accurate(P, KS, 1.0, 100.0, R, Q, is_call)
        np.testing.assert_allclose(
            np.asarray(assembled), np.asarray(vanilla), atol=2e-7,
            err_msg=f"is_call={is_call}",
        )


def test_probability_shape_and_monotonicity():
    p1, p2 = digital.probabilities(P, KS, 1.0, 100.0, R, Q)
    # both measures: P(S_T > K) decreasing in K, within [0, 1]
    for p in (np.asarray(p1), np.asarray(p2)):
        assert np.all(np.diff(p) < 0.0)
        assert np.all((p >= 0.0) & (p <= 1.0))
    # share measure dominates at every strike (S_T-weighted tilt to the right)
    assert np.all(np.asarray(p1) > np.asarray(p2))


def test_grouped_matches_ungrouped():
    # flat book: 64 strikes x 4 maturities, mixed calls/puts
    rng = np.random.default_rng(5)
    Ts = np.asarray([0.25, 0.5, 1.0, 2.0])
    t_idx = np.repeat(np.arange(4), 16)
    ks = jnp.asarray(rng.uniform(80.0, 120.0, 64))
    mats = jnp.asarray(Ts[t_idx])
    is_call = jnp.asarray(rng.integers(0, 2, 64).astype(bool))
    for kind in ("cash", "asset"):
        grouped = digital.price_grouped(
            P, ks, jnp.asarray(t_idx), jnp.asarray(Ts), 100.0, R, Q,
            is_call=is_call, kind=kind)
        plain = digital.price(P, ks, mats, 100.0, R, Q,
                              is_call=is_call, kind=kind)
        np.testing.assert_allclose(
            np.asarray(grouped), np.asarray(plain), rtol=1e-12, atol=1e-12)


def test_digital_greeks_ad():
    # the analytic pricer is differentiable: d(cash call)/dS > 0, finite
    g = jax.grad(
        lambda s: digital.price(P, 100.0, 1.0, s, R, Q).sum()
    )(100.0)
    assert np.isfinite(float(g)) and float(g) > 0.0


def test_bates_digitals_parity_and_jump_effect():
    bp = BatesParams(2.0, 0.04, 0.5, -0.7, 0.04, 0.5, -0.1, 0.15)
    c = digital.price(bp, KS, 1.0, 100.0, R, Q, is_call=True, kind="cash")
    p = digital.price(bp, KS, 1.0, 100.0, R, Q, is_call=False, kind="cash")
    np.testing.assert_allclose(
        np.asarray(c + p), np.exp(-R) * np.ones(len(KS)), atol=1e-9
    )
    # lam = 0 reduces exactly to Heston
    bp0 = BatesParams(2.0, 0.04, 0.5, -0.7, 0.04, 0.0, -0.1, 0.15)
    np.testing.assert_allclose(
        np.asarray(digital.price(bp0, KS, 1.0, 100.0, R, Q)),
        np.asarray(digital.price(P, KS, 1.0, 100.0, R, Q)),
        atol=1e-10,
    )
    # downward jumps fatten the left tail: deep-ITM-put cash digital rises
    put_heston = digital.price(P, 80.0, 1.0, 100.0, R, Q, is_call=False)
    put_bates = digital.price(bp, 80.0, 1.0, 100.0, R, Q, is_call=False)
    assert float(put_bates) > float(put_heston)


def test_mc_digital_matches_analytic():
    key = jax.random.PRNGKey(7)
    strikes = jnp.asarray([90.0, 100.0, 110.0])
    for kind in ("cash", "asset"):
        px, se = mc.price_digital_mc(
            P, strikes, 1.0, 100.0, key, rate=R, dividend=Q, kind=kind,
            n_steps=32, n_paths=32768,
        )
        want = np.asarray(digital.price(P, strikes, 1.0, 100.0, R, Q,
                                        kind=kind))
        err = np.abs(np.asarray(px) - want)
        tol = 4.0 * np.asarray(se) + (0.02 if kind == "asset" else 2e-4)
        assert np.all(err < tol), (kind, err, np.asarray(se))


def test_touch_mc_matches_reflection_formula():
    # deterministic-variance Heston == BS(0.2): bridge-corrected one-touch
    # MC must agree with the reflection-principle closed form
    key = jax.random.PRNGKey(11)
    for barrier, touch in ((115.0, True), (115.0, False), (85.0, True)):
        px, se = mc.price_touch_mc(
            DET, barrier, 1.0, 100.0, key, touch=touch, rate=R, dividend=Q,
            n_steps=32, n_paths=32768,
        )
        want = float(bsm.touch_price(100.0, barrier, R, Q, 1.0, 0.2,
                                     touch=touch))
        assert abs(float(px) - want) < 4.0 * float(se) + 5e-3, (
            barrier, touch, float(px), want, float(se))


def test_touch_complement_and_discrete_bias():
    key = jax.random.PRNGKey(3)
    one, _ = mc.price_touch_mc(P, 112.0, 1.0, 100.0, key, touch=True,
                               rate=R, n_steps=24, n_paths=16384)
    no, _ = mc.price_touch_mc(P, 112.0, 1.0, 100.0, key, touch=False,
                              rate=R, n_steps=24, n_paths=16384)
    # same paths: complements sum exactly to the discount factor
    np.testing.assert_allclose(float(one + no), np.exp(-R), rtol=1e-6)
    # discrete monitoring touches less often than continuous
    disc, _ = mc.price_touch_mc(P, 112.0, 1.0, 100.0, key, touch=True,
                                rate=R, n_steps=24, n_paths=16384,
                                continuity_correction=False)
    assert float(disc) < float(one)


def test_touch_mc_traced_barrier_needs_explicit_direction():
    """ADVICE r2: the barrier side selects a code path; traced barrier/spot
    must raise a clear error unless direction is passed explicitly — and
    with it, the call works under jit."""
    key = jax.random.PRNGKey(0)

    def priced(b, **kw):
        return mc.price_touch_mc(P, b, 0.5, 100.0, key, rate=R,
                                 n_steps=8, n_paths=512, **kw)[0]

    with pytest.raises(ValueError, match="direction"):
        jax.jit(priced)(jnp.asarray(115.0))
    with pytest.raises(ValueError, match="direction"):
        priced(115.0, direction="sideways")

    out = jax.jit(lambda b: priced(b, direction="up"))(jnp.asarray(115.0))
    assert np.isfinite(float(out))
    # explicit direction agrees with the inferred concrete-value path
    np.testing.assert_allclose(
        float(priced(115.0, direction="up")), float(priced(115.0)), rtol=1e-12
    )


def test_bs_touch_probability_sanity():
    # no-touch prob in (0,1), decreasing as the barrier approaches spot
    bs_up = np.asarray(bsm.no_touch_prob(
        100.0, jnp.asarray([105.0, 110.0, 130.0]), R, Q, 1.0, 0.2))
    assert np.all((bs_up > 0.0) & (bs_up < 1.0)) and np.all(np.diff(bs_up) > 0)
    bs_dn = np.asarray(bsm.no_touch_prob(
        100.0, jnp.asarray([95.0, 90.0, 70.0]), R, Q, 1.0, 0.2))
    assert np.all((bs_dn > 0.0) & (bs_dn < 1.0)) and np.all(np.diff(bs_dn) > 0)
    # barrier at spot: touched immediately
    assert float(bsm.no_touch_prob(100.0, 100.0, R, Q, 1.0, 0.2)) == 0.0
