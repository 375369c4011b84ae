"""Forward-start, cliquet, and pathwise-AD greeks on the QE MC engine.

Oracles: with vol-of-vol ~ 0 and v0 = theta the Heston variance path is
exactly constant, so forward-start and cliquet prices reduce to closed-form
Black-Scholes expressions on period returns; greeks cross-check the
characteristic-function AD greeks (models/heston.py, reference
src/cpp/models/heston.cpp:169-218).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_tpu.models import black_scholes as bs
from pde_tpu.models import heston_mc as mc
from pde_tpu.models.heston import HestonParams, greeks_ad

# vol-of-vol ~ 0, v0 = theta: variance path identically 0.04 -> BS(sigma=0.2)
DET = HestonParams(kappa=2.0, theta=0.04, sigma=1e-7, rho=0.0, v0=0.04)
HESTON = HestonParams(kappa=2.0, theta=0.04, sigma=0.5, rho=-0.7, v0=0.04)


def test_forward_start_degenerate_matches_bs():
    r, q, t0, T = 0.05, 0.02, 0.5, 1.0
    tau = T - t0
    key = jax.random.PRNGKey(11)
    k = jnp.asarray([0.9, 1.0, 1.1])
    price, err = mc.price_forward_start_mc(
        DET, k, t0, T, 100.0, key, rate=r, dividend=q,
        n_steps=32, n_paths=32768,
    )
    # e^{-r t0} * BS(spot=1, strike=k, maturity=tau, vol=0.2)
    oracle = np.exp(-r * t0) * np.asarray(
        bs.price(1.0, k, r, q, tau, 0.2)
    )
    np.testing.assert_allclose(
        np.asarray(price), oracle, atol=float(4.0 * jnp.max(err)) + 1e-6
    )


def test_forward_start_spot_homogeneous():
    # S_T / S_{t0} is exactly level-independent in the QE recursion: the
    # price must not depend on spot (same key -> same draws -> equality to
    # float round-off), even with full stochastic vol.
    key = jax.random.PRNGKey(3)
    kw = dict(rate=0.03, dividend=0.01, n_steps=16, n_paths=8192)
    p1, _ = mc.price_forward_start_mc(HESTON, 1.0, 0.5, 1.0, 100.0, key, **kw)
    p2, _ = mc.price_forward_start_mc(HESTON, 1.0, 0.5, 1.0, 57.0, key, **kw)
    np.testing.assert_allclose(float(p1), float(p2), rtol=1e-10)


def test_forward_start_put_call_and_fixing_grid():
    key = jax.random.PRNGKey(5)
    kw = dict(rate=0.0, dividend=0.0, n_steps=16, n_paths=8192)
    c, _ = mc.price_forward_start_mc(
        HESTON, 1.0, 0.5, 1.0, 100.0, key, is_call=True, **kw
    )
    p, _ = mc.price_forward_start_mc(
        HESTON, 1.0, 0.5, 1.0, 100.0, key, is_call=False, **kw
    )
    # r = q = 0: E[S_T/S_t0] = 1 -> ATM forward-start call = put (parity)
    assert abs(float(c) - float(p)) < 5e-3
    with pytest.raises(ValueError):
        mc.price_forward_start_mc(
            HESTON, 1.0, 0.37, 1.0, 100.0, key, **kw
        )  # fixing off the time grid must refuse, not snap


def test_cliquet_degenerate_matches_bs_strip():
    r, q, T, P = 0.03, 0.0, 1.0, 4
    lf, lc = -0.02, 0.05
    key = jax.random.PRNGKey(7)
    price, err = mc.price_cliquet_mc(
        DET, T, 100.0, key, n_periods=P, local_floor=lf, local_cap=lc,
        global_floor=-10.0, rate=r, dividend=q, n_steps=32, n_paths=32768,
    )
    # clip(x, lf, lc) = lf + (x - lf)^+ - (x - lc)^+ ; period returns are
    # iid lognormal(vol 0.2 sqrt(dt)); undiscounted call on R with strike
    # 1+k is e^{r dt} * bs.price(1, 1+k, r, q, dt, 0.2).
    dt = T / P
    call = lambda k: np.exp(r * dt) * float(
        bs.price(1.0, 1.0 + k, r, q, dt, 0.2)
    )
    per_period = lf + call(lf) - call(lc)
    oracle = np.exp(-r * T) * P * per_period
    assert abs(float(price) - oracle) < float(4.0 * err) + 1e-6


def test_cliquet_cap_monotonicity():
    key = jax.random.PRNGKey(9)
    kw = dict(n_periods=4, rate=0.0, n_steps=16, n_paths=8192)
    tight, _ = mc.price_cliquet_mc(
        HESTON, 1.0, 100.0, key, local_floor=0.0, local_cap=0.03, **kw
    )
    wide, _ = mc.price_cliquet_mc(
        HESTON, 1.0, 100.0, key, local_floor=0.0, local_cap=0.10, **kw
    )
    assert float(wide) >= float(tight) > 0.0


def test_greeks_mc_ad_matches_fd_of_same_estimator():
    # AD-vs-FD on the *same* MC estimator (same key): validates the
    # differentiation plumbing exactly, independent of estimator bias.
    # Uses a deep-Feller parameter set (psi stays in the quadratic QE branch
    # on every lane) so the fixed-key estimator is a smooth function of the
    # bumped inputs — with Feller violated, branch-indicator flips make the
    # FD quotient itself noisy, which is an estimator property, not an AD bug.
    smooth = HestonParams(kappa=3.0, theta=0.09, sigma=0.3, rho=-0.5, v0=0.09)
    key = jax.random.PRNGKey(13)
    kw = dict(rate=0.02, dividend=0.0, n_steps=12, n_paths=4096)
    g = mc.greeks_european_mc(smooth, 100.0, 1.0, 100.0, key, **kw)

    def reprice(spot=100.0, v0=smooth.v0):
        p, _ = mc.price_european_mc(
            smooth._replace(v0=v0), jnp.asarray([100.0]), 1.0, spot, key, **kw
        )
        return float(p[0])

    h = 1e-4
    fd_delta = (reprice(spot=100.0 + h) - reprice(spot=100.0 - h)) / (2 * h)
    fd_vega = (reprice(v0=smooth.v0 + h) - reprice(v0=smooth.v0 - h)) / (2 * h)
    assert abs(float(g["delta"]) - fd_delta) < 1e-5 * max(1.0, abs(fd_delta))
    assert abs(float(g["vega"]) - fd_vega) < 1e-3 * max(1.0, abs(fd_vega))


def test_greeks_mc_against_cf_ad():
    key = jax.random.PRNGKey(17)
    g = mc.greeks_european_mc(
        HESTON, 100.0, 1.0, 100.0, key,
        rate=0.05, dividend=0.02, n_steps=32, n_paths=65536,
    )
    exact = greeks_ad(HESTON, 100.0, 1.0, 100.0, rate=0.05, dividend=0.02)
    assert abs(float(g["price"]) - float(exact["price"])) < float(
        4.0 * g["stderr"]
    ) + 5e-3
    assert abs(float(g["delta"]) - float(exact["delta"])) < 0.02
    # parameter greeks carry O(dt) pathwise bias through the QE branch
    # indicator -- 15% relative is the documented envelope
    assert abs(float(g["vega"]) - float(exact["vega"])) < 0.15 * abs(
        float(exact["vega"])
    )
    assert abs(float(g["rho"]) - float(exact["rho"])) < 0.05 * abs(
        float(exact["rho"])
    )


def test_greeks_mc_vector_strikes_shape():
    key = jax.random.PRNGKey(19)
    g = mc.greeks_european_mc(
        HESTON, jnp.asarray([90.0, 100.0, 110.0]), 0.5, 100.0, key,
        n_steps=8, n_paths=2048,
    )
    for k in ("price", "delta", "vega", "d_kappa", "d_theta", "d_sigma", "d_rho"):
        assert g[k].shape == (3,), k
    # call deltas decrease in strike
    d = np.asarray(g["delta"])
    assert d[0] > d[1] > d[2] > 0.0
