"""Bermudan swaptions under G2++: exact-transition LSM + Andersen-Broadie
dual.

Two-factor companion of solvers/bermudan_hw.py.  The state
``(x, y, int (x+y))`` is jointly Gaussian with closed-form moments
(models/g2.g2_joint_increment_moments), so paths step exercise-date to
exercise-date with ZERO discretization bias, and the same martingale-dual
sandwich applies:

    lower (out-of-sample policy value)  <=  price  <=  upper (A-B dual).

Why it matters: a one-factor model prices Bermudans off perfectly
correlated forward rates; G2++'s decorrelation changes the exercise
boundary (a two-dimensional curve here, not a point), and the LSM
regression basis is the quadratic in (x, y) — the standard production
setup.  Validated by the single-date collapse onto the Gauss-Hermite
European formula (models/g2.g2_swaption), which is itself pinned to
closed-form ZCB options and direct MC.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.precision import result_dtype
from ..models import g2 as g2_mod
from ..models.g2 import G2Params

__all__ = ["remaining_swap_value_g2", "bermudan_swaption_g2_mc"]


def remaining_swap_value_g2(
    params: G2Params, strike_rate, schedule, j, x, y, payer=True
):
    """Value at schedule date ``T_j`` of entering the remaining swap
    (same payoff convention as solvers/bermudan_hw.remaining_swap_value,
    now a function of both factors).  ``j`` static; broadcasts over x/y."""
    schedule = jnp.asarray(schedule)
    taus = jnp.diff(schedule)
    pay = schedule[j + 1:]
    coupons = taus[j:] * jnp.asarray(strike_rate)
    coupons = coupons.at[-1].add(1.0)
    t_j = schedule[j]
    bonds = g2_mod.g2_bond(
        params, pay, t_j, jnp.asarray(x)[..., None], jnp.asarray(y)[..., None])
    val = 1.0 - jnp.sum(coupons * bonds, axis=-1)
    return val if payer else -val


def _basis2(x, y):
    """Quadratic bivariate basis — 6 features."""
    return jnp.stack(
        [jnp.ones_like(x), x, y, x * x, y * y, x * y], axis=-1)


def _step_sampler(params, t_a, t_b, dtype):
    """Closed-form one-step sampler factory for (x, y, log D) between two
    dates: returns f(x, y, logd, key) -> (x', y', logd')."""
    (ea, eb, Ba, Bb), cov = g2_mod.g2_joint_increment_moments(
        params, t_b - t_a)
    L = jnp.linalg.cholesky(cov + 1e-18 * jnp.eye(3, dtype=dtype))
    da = g2_mod.g2_phi_integral(params, t_a, t_b)

    def step(xv, yv, logd, key):
        z = jax.random.normal(key, (3,) + xv.shape, dtype)
        eps = jnp.tensordot(L, z, axes=1)
        x_new = xv * ea + eps[0]
        y_new = yv * eb + eps[1]
        S = xv * Ba + yv * Bb + eps[2]
        return x_new, y_new, logd - da - S

    return step


@functools.partial(
    jax.jit,
    static_argnames=("payer", "exercise", "n_paths", "n_outer", "n_inner"),
)
def _bermudan_g2_impl(
    params, strike_rate, schedule, key, *,
    payer, exercise, n_paths, n_outer, n_inner,
):
    dtype = schedule.dtype
    ex_idx = tuple(j for j, b in enumerate(exercise) if b)
    n_ex = len(ex_idx)
    ex_dates = jnp.concatenate(
        [jnp.zeros((1,), dtype), schedule[jnp.asarray(ex_idx)]])
    steps = [
        _step_sampler(params, ex_dates[r], ex_dates[r + 1], dtype)
        for r in range(n_ex)
    ]

    def payoff_at(row, x, y):
        return jnp.maximum(
            remaining_swap_value_g2(
                params, strike_rate, schedule, ex_idx[row], x, y, payer),
            0.0,
        )

    def simulate(n, k):
        xs, ys, lds = [], [], []
        xv = jnp.zeros((n,), dtype)
        yv = jnp.zeros((n,), dtype)
        ld = jnp.zeros((n,), dtype)
        for r in range(n_ex):
            k, k_r = jax.random.split(k)
            xv, yv, ld = steps[r](xv, yv, ld, k_r)
            xs.append(xv)
            ys.append(yv)
            lds.append(ld)
        return jnp.stack(xs), jnp.stack(ys), jnp.stack(lds)

    k_reg, k_out, k_in = jax.random.split(key, 3)

    # -- phase 1: frozen policy (regression in decision-date units) -------
    xs, ys, lds = simulate(n_paths, k_reg)
    ds = jnp.exp(lds)
    pay = jnp.stack([payoff_at(j, xs[j], ys[j]) for j in range(n_ex)])

    cash = ds[-1] * pay[-1]
    betas = []
    for j in range(n_ex - 2, -1, -1):
        phi = _basis2(xs[j], ys[j])
        w = (pay[j] > 0.0).astype(dtype)
        gram = (phi * w[:, None]).T @ phi + 1e-10 * jnp.eye(
            phi.shape[-1], dtype=dtype)
        rhs = (phi * w[:, None]).T @ (cash / ds[j])
        beta = jnp.linalg.solve(gram, rhs)
        cont = phi @ beta
        ex = (pay[j] > 0.0) & (pay[j] > cont)
        cash = jnp.where(ex, ds[j] * pay[j], cash)
        betas.append(beta)
    betas = jnp.stack(betas[::-1] + [jnp.zeros((6,), dtype)])

    def policy_stops(row, x, y):
        if row == n_ex - 1:
            return jnp.ones(jnp.shape(x), bool)
        hv = payoff_at(row, x, y)
        cont = _basis2(x, y) @ betas[row]
        return (hv > 0.0) & (hv > cont)

    def continuation(start, x0, y0, logd0, k_t):
        val = jnp.zeros(x0.shape, dtype)
        active = jnp.ones(x0.shape, bool)
        xv, yv, ld = x0, y0, logd0
        for row in range(start + 1, n_ex):
            k_t, k_u = jax.random.split(k_t)
            xv, yv, ld = steps[row](xv, yv, ld, k_u)
            stop = active & policy_stops(row, xv, yv)
            val = val + jnp.where(
                stop, jnp.exp(ld) * payoff_at(row, xv, yv), 0.0)
            active = active & ~stop
        return val

    # -- phase 2: out-of-sample lower bound ------------------------------
    n0 = n_outer * n_inner
    k0, k_in = jax.random.split(k_in)
    zeros = jnp.zeros((n0,), dtype)
    val0 = continuation(-1, zeros, zeros, zeros, k0)
    lower = jnp.mean(val0)
    se_lower = jnp.std(val0) / jnp.sqrt(1.0 * n0)

    # -- phase 3: dual ----------------------------------------------------
    xs_o, ys_o, lds_o = simulate(n_outer, k_out)
    d_o = jnp.exp(lds_o)
    h_o = jnp.stack(
        [payoff_at(j, xs_o[j], ys_o[j]) for j in range(n_ex)]) * d_o

    m = jnp.zeros((n_outer,), dtype)
    g_max = jnp.full((n_outer,), -jnp.inf, dtype)
    c_prev = lower
    for row in range(n_ex):
        if row < n_ex - 1:
            k_row, k_in = jax.random.split(k_in)
            c_here = jnp.mean(
                continuation(
                    row,
                    jnp.repeat(xs_o[row], n_inner),
                    jnp.repeat(ys_o[row], n_inner),
                    jnp.repeat(lds_o[row], n_inner),
                    k_row,
                ).reshape(n_outer, n_inner), axis=1)
            stops = policy_stops(row, xs_o[row], ys_o[row])
            v_hat = jnp.where(stops, h_o[row], c_here)
        else:
            v_hat = h_o[row]
            c_here = jnp.zeros_like(v_hat)
        m = m + (v_hat - c_prev)
        g_max = jnp.maximum(g_max, h_o[row] - m)
        c_prev = c_here
    g_pos = jnp.maximum(g_max, 0.0)
    upper = jnp.mean(g_pos)
    se_upper = jnp.std(g_pos) / jnp.sqrt(1.0 * n_outer)
    return lower, se_lower, upper, se_upper


def bermudan_swaption_g2_mc(
    params: G2Params,
    strike_rate,
    schedule,
    key,
    *,
    payer: bool = True,
    exercise: Tuple[bool, ...] | None = None,
    n_paths: int = 65536,
    n_outer: int = 512,
    n_inner: int = 64,
):
    """Bermudan swaption price sandwich under G2++ (exact transitions).

    Returns ``(lower, se_lower, upper, se_upper)``; conventions identical
    to solvers/bermudan_hw.bermudan_swaption_mc.
    """
    schedule = jnp.asarray(schedule)
    dtype = result_dtype(schedule, params.sigma)
    schedule = schedule.astype(dtype)
    m = int(schedule.shape[0]) - 1
    if exercise is None:
        exercise = (True,) * m
    exercise = tuple(bool(b) for b in exercise)
    if len(exercise) != m or not any(exercise):
        raise ValueError("exercise must flag at least one of the M dates")
    return _bermudan_g2_impl(
        params, jnp.asarray(strike_rate, dtype), schedule, key,
        payer=payer, exercise=exercise,
        n_paths=n_paths, n_outer=n_outer, n_inner=n_inner)
