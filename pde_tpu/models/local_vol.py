"""Dupire local volatility, extracted by automatic differentiation.

A model family beyond the reference (dharvpat/PDE has no local-vol model):
the Dupire (1994) local variance

    sigma_loc^2(K, T) = (dC/dT + (r - q) K dC/dK + q C) / (K^2/2 d2C/dK2)

needs first and second derivatives of the call surface in strike and
maturity.  The reference-architecture way is finite differences on a price
grid; the JAX way is **exact AD through the pricer**: every CF pricer in
:mod:`pde_tpu.models.heston` is smooth in (K, T) (fixed quadrature nodes,
forward-moneyness phase), so ``jax.grad`` delivers machine-accurate
derivatives — and because :class:`~pde_tpu.models.bates.BatesParams` rides
the same pricers, the SAME code extracts the (jump-steepened) local vol of
Bates.  The implied-variance form (Gatheral 2006, Eq. 1.10) is also
provided for market surfaces parameterized by smooth IV fits (e.g. the SVI
stack in data/options).

Together with :mod:`pde_tpu.solvers.local_vol_pde` this closes the classic
consistency loop — Heston CF prices -> AD Dupire surface -> local-vol PDE
re-prices the vanillas — which the tests assert to ~0.3%.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.precision import result_dtype
from . import heston as heston_model

__all__ = [
    "local_vol_from_price_fn",
    "dupire_surface",
    "local_vol_from_implied_fn",
    "SurfaceInterpolator",
]


def local_vol_from_price_fn(price_fn, strike, maturity, rate=0.0,
                            dividend=0.0, *, floor=1e-2, cap=4.0):
    """Dupire local vol at one (K, T) from a differentiable CALL price
    ``price_fn(K, T)``.  All derivatives by AD; the variance ratio is
    clamped to [floor^2, cap^2], and points where the surface carries no
    information (d2C/dK2 underflows in the far wings — the risk-neutral
    density is ~0 there, so NO extraction method can see local vol) return
    **NaN**, which :func:`dupire_surface` fills with the nearest valid
    strike's value (the standard flat-wing extrapolation).  vmap freely."""
    K = jnp.asarray(strike)
    T = jnp.asarray(maturity)
    c = price_fn(K, T)
    dc_dt = jax.grad(price_fn, argnums=1)(K, T)
    dc_dk = jax.grad(price_fn, argnums=0)(K, T)
    d2c_dk2 = jax.grad(jax.grad(price_fn, argnums=0), argnums=0)(K, T)
    num = dc_dt + (rate - dividend) * K * dc_dk + dividend * c
    den = 0.5 * K * K * d2c_dk2
    # information threshold: the second derivative must stand clear of the
    # pricer's own AD noise floor (quadrature round-off scales with eps)
    tiny = 200.0 * jnp.finfo(jnp.asarray(c).dtype).eps
    var = num / jnp.maximum(den, 1e-300)
    ok = (den > tiny) & (num > 0.0) & jnp.isfinite(var)
    var = jnp.clip(var, floor * floor, cap * cap)
    return jnp.where(ok, jnp.sqrt(var), jnp.nan)


def _fill_nan_nearest(row):
    """Replace NaNs with the nearest valid value along the (strike) axis —
    flat wing extrapolation, vectorized with two associative scans."""
    n = row.shape[0]
    idx = jnp.arange(n)
    valid = ~jnp.isnan(row)
    last = jax.lax.associative_scan(jnp.maximum, jnp.where(valid, idx, -1))
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(valid, idx, n), reverse=True)
    d_f = jnp.where(last >= 0, idx - last, n + 1)
    d_b = jnp.where(nxt < n, nxt - idx, n + 1)
    pick = jnp.where(d_f <= d_b, jnp.clip(last, 0, n - 1),
                     jnp.clip(nxt, 0, n - 1))
    return jnp.where(valid, row, row[pick])


@functools.partial(jax.jit, static_argnames=("n_per_panel",))
def dupire_surface(params, strikes, maturities, spot, rate=0.0, dividend=0.0,
                   *, n_per_panel: int = 40):
    """Local-vol surface ``(len(maturities), len(strikes))`` from any
    CF-priced model (HestonParams or BatesParams — the affine-extension
    hook makes the jump-steepened Bates local vol come out of the same
    code).  Prices through the CONVERGED composite-GL rule
    (price_accurate_gl), not the reference-parity truncated quadrature:
    the u-truncation bias is invisible in prices (~1e-4) but differentiating
    twice in strike amplifies it into a visible density error — the same
    reason the Bates calibrator objectives use the converged rule
    (calibrate/bates.py)."""
    dt = result_dtype(strikes, maturities, spot, params.kappa)
    Ks = jnp.asarray(strikes, dt)
    Ts = jnp.asarray(maturities, dt)

    def price_fn(K, T):
        return heston_model.price_accurate_gl(
            params, K, T, spot, rate, dividend, is_call=True,
            n_per_panel=n_per_panel,
        )

    def one(K, T):
        return local_vol_from_price_fn(price_fn, K, T, rate, dividend)

    raw = jax.vmap(lambda T: jax.vmap(lambda K: one(K, T))(Ks))(Ts)
    # wings where the density underflowed come back NaN: flat-extrapolate
    # from the nearest informative strike, per maturity
    return jax.vmap(_fill_nan_nearest)(raw)


def local_vol_from_implied_fn(iv_fn, strike, maturity, spot, rate=0.0,
                              dividend=0.0, *, floor=1e-4, cap=4.0):
    """Dupire in implied-total-variance form (Gatheral 2006, Eq. 1.10):
    numerically robust for MARKET surfaces given a smooth IV fit
    ``iv_fn(K, T)`` (e.g. an SVI slice interpolation, data/options.py).

    With w(y, T) = iv^2 T at log-forward-moneyness y = ln(K/F(T)):

        sigma_loc^2 = dw/dT / [1 - y/w dw/dy
                               + 1/4 (-1/4 - 1/w + y^2/w^2) (dw/dy)^2
                               + 1/2 d2w/dy2]

    The T-derivative is at FIXED y — evaluating w through y's definition
    lets AD apply the chain rule for us.
    """
    K = jnp.asarray(strike)
    T0 = jnp.asarray(maturity)
    spot = jnp.asarray(spot)

    def w_of(y, T):
        F = spot * jnp.exp((rate - dividend) * T)
        Kf = F * jnp.exp(y)
        iv = iv_fn(Kf, T)
        return iv * iv * T

    F0 = spot * jnp.exp((rate - dividend) * T0)
    y0 = jnp.log(K / F0)
    w = w_of(y0, T0)
    dw_dt = jax.grad(w_of, argnums=1)(y0, T0)
    dw_dy = jax.grad(w_of, argnums=0)(y0, T0)
    d2w_dy2 = jax.grad(jax.grad(w_of, argnums=0), argnums=0)(y0, T0)
    denom = (
        1.0
        - y0 / w * dw_dy
        + 0.25 * (-0.25 - 1.0 / w + (y0 * y0) / (w * w)) * dw_dy * dw_dy
        + 0.5 * d2w_dy2
    )
    var = dw_dt / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    ok = (denom > 1e-6) & (dw_dt > 0.0) & jnp.isfinite(var)
    var = jnp.clip(var, floor * floor, cap * cap)
    # NaN where the fit itself is arbitrage-inconsistent (denom <= 0 is the
    # butterfly/calendar violation signature) — same convention as the
    # price form; fill with _fill_nan_nearest when gridding
    return jnp.where(ok, jnp.sqrt(var), jnp.nan)


def simulate_local_vol(vol_fn, spot, maturity, key, *, n_steps: int = 64,
                       n_paths: int = 65536, rate=0.0, dividend=0.0,
                       antithetic: bool = True):
    """Log-Euler Monte Carlo under a local-vol surface: per step

        ln S += (r - q - 0.5 sigma^2(S, t)) dt + sigma(S, t) sqrt(dt) Z

    with ``vol_fn(s_array, t_scalar)`` (a :class:`SurfaceInterpolator` or
    any closure).  Returns :class:`~pde_tpu.models.heston_mc.MCPaths`, so
    the whole exotic-payoff estimator stack (Asian/barrier/lookback,
    control variates) prices under SMILE-CONSISTENT dynamics:

        heston_mc.price_barrier_mc(None, ..., simulate_fn=functools.partial(
            simulate_local_vol_as_qe, interp))

    or through the :func:`lv_simulate_fn` adapter.  The discounted spot is
    a martingale under the exact dynamics (log-Euler bias is O(dt)), so the
    delta-one control variate remains valid.  Not jitted here — ``vol_fn``
    is a closure; wrap the caller in ``jax.jit``.
    """
    from .heston_mc import MCPaths

    dtype = result_dtype(spot, maturity)
    if antithetic and n_paths % 2:
        raise ValueError("antithetic sampling needs an even n_paths")
    n_draw = n_paths // 2 if antithetic else n_paths

    dt_step = jnp.asarray(maturity, dtype) / n_steps
    sq_dt = jnp.sqrt(dt_step)
    drift_rq = (jnp.asarray(rate, dtype) - jnp.asarray(dividend, dtype))
    s0 = jnp.asarray(spot, dtype)
    state0 = (
        jnp.full((n_paths,), jnp.log(s0), dtype),
        jnp.zeros((n_paths,), dtype),
        jnp.full((n_paths,), s0, dtype),
        jnp.full((n_paths,), s0, dtype),
    )

    def step(state, inp):
        ln_s, s_sum, s_max, s_min = state
        t, k_t = inp
        z = jax.random.normal(k_t, (n_draw,), dtype)
        z = jnp.concatenate([z, -z]) if antithetic else z
        sig = vol_fn(jnp.exp(ln_s), t)
        ln_s = ln_s + (drift_rq - 0.5 * sig * sig) * dt_step + sig * sq_dt * z
        s = jnp.exp(ln_s)
        return (ln_s, s_sum + s, jnp.maximum(s_max, s),
                jnp.minimum(s_min, s)), None

    ts = dt_step * jnp.arange(n_steps, dtype=dtype)  # left-point evaluation
    keys = jax.random.split(key, n_steps)
    (ln_s, s_sum, s_max, s_min), _ = jax.lax.scan(step, state0, (ts, keys))
    spot_T = jnp.exp(ln_s)
    sig_T = vol_fn(spot_T, jnp.asarray(maturity, dtype))
    return MCPaths(spot_T, sig_T * sig_T, s_sum / n_steps, s_max, s_min)


def lv_simulate_fn(vol_fn):
    """Adapter making :func:`simulate_local_vol` a drop-in ``simulate_fn``
    for the :mod:`pde_tpu.models.heston_mc` estimators (which pass a params
    pytree first — ignored here; the surface IS the model)."""
    def fn(params, spot, maturity, key, **kwargs):
        del params
        return simulate_local_vol(vol_fn, spot, maturity, key, **kwargs)
    return fn


class SurfaceInterpolator:
    """Bilinear interpolation of a precomputed local-vol grid in
    (ln K, T) — the standard way to feed a Dupire surface to a PDE march
    (re-deriving sigma_loc by AD at every grid node every step would
    re-price the surface thousands of times).  Jittable; clamps outside
    the grid (flat extrapolation, the market-standard choice)."""

    def __init__(self, strikes, maturities, vol_grid):
        self.log_k = jnp.log(jnp.asarray(strikes))
        self.t = jnp.asarray(maturities)
        self.vols = jnp.asarray(vol_grid)  # (n_T, n_K)

    def __call__(self, s, t):
        """sigma_loc at spot level(s) ``s`` (array ok) and scalar time
        ``t``."""
        x = jnp.log(jnp.asarray(s))
        xk = self.log_k
        tt = self.t
        ix = jnp.clip(jnp.searchsorted(xk, x) - 1, 0, xk.shape[0] - 2)
        it = jnp.clip(jnp.searchsorted(tt, t) - 1, 0, tt.shape[0] - 2)
        wx = jnp.clip((x - xk[ix]) / (xk[ix + 1] - xk[ix]), 0.0, 1.0)
        wt = jnp.clip((t - tt[it]) / (tt[it + 1] - tt[it]), 0.0, 1.0)
        v00 = self.vols[it, ix]
        v01 = self.vols[it, ix + 1]
        v10 = self.vols[it + 1, ix]
        v11 = self.vols[it + 1, ix + 1]
        return ((1 - wt) * ((1 - wx) * v00 + wx * v01)
                + wt * ((1 - wx) * v10 + wx * v11))
