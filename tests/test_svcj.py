"""SVCJ (Duffie-Pan-Singleton co-jump) model tests (models/svcj.py).

The CF correction is the closed-form time-integrated jump transform — the
tests pin it against (a) the martingale identity, (b) exact reduction to
Bates at mu_v = 0, (c) Monte Carlo with gamma variance jumps and
conditionally-normal price jumps, and (d) MC integrated-variance statistics
for the variance-swap hooks.  Model family beyond the reference (it ships
Heston/SABR/OU only, /root/reference/src/cpp/models/).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import varswap
from pde_tpu.models.bates import BatesParams
from pde_tpu.models.bates import price_accurate as bates_price
from pde_tpu.models.svcj import (
    SVCJParams,
    implied_volatility,
    price_accurate,
    price_european_mc,
    simulate_qe,
    simulate_qe_paths,
    simulate_qe_qv,
)

P = SVCJParams(kappa=3.5, theta=0.035, sigma=0.3, rho=-0.6, v0=0.04,
               lam=0.6, mu_x=-0.05, sigma_x=0.1, mu_v=0.02, rho_j=-0.5)
KS = np.array([80.0, 100.0, 120.0])


def test_cf_factor_martingale_identity():
    """The jump CF factor must be exactly 1 at u = -i (forward preserved)."""
    for T in (0.1, 1.0, 5.0):
        f = P.cf_reduced_extra(
            jnp.asarray(-1j, jnp.complex128), jnp.asarray(float(T)),
            jnp.float64, jnp.complex128)
        assert abs(complex(f) - 1.0) < 1e-12


def test_mu_v_zero_reduces_to_bates():
    """mu_v = 0 kills the variance jump: prices must match BatesParams to
    machine precision (the integral collapses to the Bates factor exactly —
    a*g + b = 0 algebraically, not just numerically)."""
    p0 = P._replace(mu_v=0.0, rho_j=0.0)
    b0 = BatesParams(3.5, 0.035, 0.3, -0.6, 0.04, 0.6, -0.05, 0.1)
    ps = np.asarray(price_accurate(p0, KS, 1.0, 100.0, rate=0.05, dividend=0.02))
    pb = np.asarray(bates_price(b0, KS, 1.0, 100.0, rate=0.05, dividend=0.02))
    np.testing.assert_allclose(ps, pb, atol=1e-12)


def test_lam_zero_reduces_to_heston():
    from pde_tpu.models.heston import HestonParams
    from pde_tpu.models.heston import price_accurate as heston_price

    p0 = P._replace(lam=0.0)
    h = HestonParams(3.5, 0.035, 0.3, -0.6, 0.04)
    ps = np.asarray(price_accurate(p0, KS, 1.0, 100.0, rate=0.05))
    ph = np.asarray(heston_price(h, KS, 1.0, 100.0, rate=0.05))
    np.testing.assert_allclose(ps, ph, atol=1e-12)


@pytest.mark.slow
def test_cf_price_vs_monte_carlo():
    """Full SVCJ CF price vs the QE + co-jump simulator, 3 strikes."""
    cf = np.asarray(price_accurate(P, KS, 1.0, 100.0, rate=0.05, dividend=0.02))
    pr, se = price_european_mc(
        P, KS, 1.0, 100.0, jax.random.PRNGKey(3), rate=0.05, dividend=0.02,
        n_steps=128, n_paths=1 << 17)
    z = (cf - np.asarray(pr)) / np.asarray(se)
    assert np.all(np.abs(z) < 4.0), f"z-scores {z}"


def test_mc_martingale():
    """Discounted terminal spot must average to the forward."""
    paths = simulate_qe(P, 100.0, 1.0, jax.random.PRNGKey(5), rate=0.05,
                        dividend=0.02, n_steps=64, n_paths=1 << 15)
    fwd = float(np.mean(np.asarray(paths.spot))) * np.exp(-0.03)
    assert abs(fwd - 100.0) < 0.35


def test_fair_variance_strike_vs_mc():
    """qv_mean_extra: v-jump feed-through + price-jump QV, against MC."""
    p = P._replace(mu_x=0.0, sigma_x=0.0, rho_j=0.0, lam=1.0, mu_v=0.03)
    T = 1.0
    _, v = simulate_qe_paths(p, 100.0, T, jax.random.PRNGKey(11), rate=0.0,
                             n_steps=256, n_paths=1 << 15)
    vbar = np.asarray(v).mean(axis=0)
    fv = float(np.asarray(varswap.fair_variance_strike(p, T)))
    se = vbar.std() / np.sqrt(len(vbar))
    # right-endpoint Riemann bias is O(dt * jump rate); allow 4 se + bias
    assert abs(fv - vbar.mean()) < 4.0 * se + 3e-4


def test_integrated_variance_laplace_vs_mc():
    """qv_log_laplace_extra (v-jump leg): closed form vs MC for scalar s."""
    p = P._replace(mu_x=0.0, sigma_x=0.0, rho_j=0.0, lam=1.0, mu_v=0.03)
    T = 1.0
    _, v = simulate_qe_paths(p, 100.0, T, jax.random.PRNGKey(11), rate=0.0,
                             n_steps=256, n_paths=1 << 15)
    vbar = np.asarray(v).mean(axis=0)
    for s in (2.0, 10.0):
        lcf = float(np.asarray(varswap.integrated_variance_laplace(p, s, T)))
        lmc = float(np.mean(np.exp(-s * vbar * T)))
        assert abs(lcf - lmc) < 5e-3, (s, lcf, lmc)


def test_joint_laplace_vs_mc_both_legs():
    """qv_log_laplace_extra with BOTH co-jump legs live (rho_j != 0,
    sigma_x > 0, mu_v > 0): the joint expectation E[e^{-s Zx^2 - Zv B}]
    does not factor into the marginal legs — pin the exact time-integrated
    joint transform against realized QV (trapezoid int v dt + sum Zx^2)."""
    p = P._replace(lam=1.0, mu_v=0.03)
    T = 1.0
    iv, qj = simulate_qe_qv(p, 100.0, T, jax.random.PRNGKey(7), rate=0.0,
                            n_steps=256, n_paths=1 << 15)
    qv = np.asarray(iv) + np.asarray(qj)
    for s in (2.0, 10.0):
        lcf = float(np.asarray(varswap.integrated_variance_laplace(p, s, T)))
        lmc = float(np.mean(np.exp(-s * qv)))
        se = float(np.std(np.exp(-s * qv)) / np.sqrt(qv.size))
        assert abs(lcf - lmc) < 4.0 * se + 3e-3, (s, lcf, lmc, se)


def test_vol_swap_strike_jensen():
    """Exact vol-swap strike (vector-s quadrature through the hook) sits
    strictly below sqrt(fair variance)."""
    kvar = float(np.asarray(varswap.fair_variance_strike(P, 1.0)))
    kvol = float(np.asarray(varswap.fair_volatility_strike(P, 1.0)))
    assert 0.0 < kvol < np.sqrt(kvar)


def test_implied_vol_smile_shape():
    """Co-jumps with rho_j < 0 steepen the put wing: downside IV above
    upside IV."""
    ks = np.array([80.0, 100.0, 125.0])
    # implied_volatility prices the model internally (heston.py:744 hook);
    # accurate=True inverts the converged GL rule, needed at T=0.5.
    ivs = np.asarray(
        implied_volatility(P, ks, 0.5, 100.0, rate=0.03, accurate=True))
    assert ivs[0] > ivs[-1]
    assert np.all((ivs > 0.05) & (ivs < 1.0))


def test_validate():
    P.validate()
    with pytest.raises(ValueError):
        P._replace(rho_j=60.0).validate()  # rho_j * mu_v >= 1
    with pytest.raises(ValueError):
        P._replace(lam=-1.0).validate()


def test_round_trip_array():
    arr = P.to_array()
    p2 = SVCJParams.from_array(arr)
    np.testing.assert_allclose(np.asarray(p2.to_array()), np.asarray(arr))
