"""Analytic forward-start / cliquet-strip pricing (models/forward_start.py).

Three independent cross-checks of the chi-square-mixed forward CF:
the exact t0->0 vanilla reduction, the deterministic-variance point-mass
reduction, and full-Heston agreement with the QE Monte Carlo route.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pde_tpu.models import black_scholes as bsm
from pde_tpu.models import forward_start as fs
from pde_tpu.models import heston
from pde_tpu.models import heston_mc as mc
from pde_tpu.models.heston import HestonParams

P = HestonParams(2.0, 0.04, 0.5, -0.7, 0.04)
# vol-of-vol ~ 0 and v0 = theta: v_{t0} is a point mass at v0, so the mixing
# factor must be exactly 1 and forward-start == e^{-r t0} * vanilla(spot=1)
DET = HestonParams(2.0, 0.04, 1e-7, 0.0, 0.04)


def test_t0_zero_reduces_to_vanilla():
    p0 = fs.price_forward_start(P, 1.0, 0.0, 1.0, rate=0.05, dividend=0.02)
    van = heston.price_accurate(P, 1.0, 1.0, 1.0, 0.05, 0.02, True)
    np.testing.assert_allclose(float(p0), float(van), rtol=1e-12)


def test_point_mass_variance_reduces_to_deferred_vanilla():
    r, q, t0, T = 0.05, 0.02, 0.5, 1.0
    k = jnp.asarray([0.9, 1.0, 1.1])
    p = fs.price_forward_start(DET, k, t0, T, rate=r, dividend=q)
    van = np.exp(-r * t0) * np.asarray(
        heston.price_accurate(DET, k, T - t0, 1.0, r, q, True)
    )
    # identical quadrature on both sides -> only the mixing factor differs,
    # and it must be 1 to round-off
    np.testing.assert_allclose(np.asarray(p), van, atol=1e-10)
    # and the BS closed form agrees to the vanilla pricer's own sigma->0
    # conditioning envelope (~5e-5 at sigma=1e-7, a pre-existing CF property)
    oracle = np.exp(-r * t0) * np.asarray(bsm.price(1.0, k, r, q, T - t0, 0.2))
    np.testing.assert_allclose(np.asarray(p), oracle, atol=2e-4)


def test_full_heston_matches_mc():
    r, q, t0, T = 0.05, 0.02, 0.5, 1.0
    k = jnp.asarray([0.9, 1.0, 1.1])
    pa = np.asarray(fs.price_forward_start(P, k, t0, T, rate=r, dividend=q))
    pm, err = mc.price_forward_start_mc(
        P, k, t0, T, 100.0, jax.random.PRNGKey(2),
        rate=r, dividend=q, n_steps=64, n_paths=65536,
    )
    np.testing.assert_allclose(
        pa, np.asarray(pm), atol=float(4.0 * jnp.max(err)) + 5e-4
    )


def test_put_call_parity_on_forward_return():
    # E[S_T/S_t0] = e^{(r-q)tau}: C - P = e^{-r t0}(e^{-q tau} - k e^{-r tau})
    r, q, t0, T, k = 0.04, 0.01, 0.25, 1.0, 1.05
    tau = T - t0
    c = float(fs.price_forward_start(P, k, t0, T, rate=r, dividend=q, is_call=True))
    p = float(fs.price_forward_start(P, k, t0, T, rate=r, dividend=q, is_call=False))
    parity = np.exp(-r * t0) * (np.exp(-q * tau) - k * np.exp(-r * tau))
    np.testing.assert_allclose(c - p, parity, atol=1e-8)


def test_cliquet_strip_matches_mc():
    pa = float(fs.price_cliquet_strip(
        P, 1.0, n_periods=4, local_floor=-0.02, local_cap=0.05, rate=0.03
    ))
    pm, err = mc.price_cliquet_mc(
        P, 1.0, 100.0, jax.random.PRNGKey(4),
        n_periods=4, local_floor=-0.02, local_cap=0.05,
        global_floor=-10.0, rate=0.03, n_steps=64, n_paths=65536,
    )
    assert abs(pa - float(pm)) < float(4.0 * err) + 5e-4


def test_forward_smile_flattens_with_kappa():
    # fast mean reversion pins v_{t0} near theta: the forward smile of a
    # high-kappa model is closer to its spot smile than a low-kappa one
    def smile_gap(kappa):
        p = P._replace(kappa=kappa)
        fwd = fs.price_forward_start(p, 1.0, 1.0, 2.0)
        spot_started = heston.price_accurate(p, 1.0, 1.0, 1.0, 0.0, 0.0, True)
        return abs(float(fwd) - float(spot_started))

    assert smile_gap(8.0) < smile_gap(0.5)
