"""Local-volatility 1D PDE solver (log-space Crank-Nicolson), TPU-native.

Generalizes :mod:`pde_tpu.solvers.bs_pde` (reference counterpart
black_scholes_pde.hpp — constant vol) to a state- and time-dependent
diffusion sigma(S, t):

    V_t + 0.5 sigma(S,t)^2 V_xx + (r - q - 0.5 sigma(S,t)^2) V_x - r V = 0

in x = ln S.  The operator varies per step, so instead of bs_pde's
factor-once Thomas the scan rebuilds the three diagonals each step from
``vol_fn(s_grid, t)`` and solves through :func:`pde_tpu.ops.tridiag.
tridiagonal_solve` — still one batched tridiagonal pass per step, still
`vmap`-able over contracts when they share a surface.

Paired with :mod:`pde_tpu.models.local_vol` (AD Dupire extraction) this is
the local-vol model family the reference lacks: calibrate Heston/Bates ->
extract sigma_loc by AD -> price path-dependent/American contracts on the
smile-consistent diffusion.  tests/test_local_vol.py closes the loop
(CF vanillas reproduced to ~0.3%).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core import grids
from ..ops.tridiag import tridiagonal_solve

__all__ = ["LVPDEResult", "solve"]


class LVPDEResult(NamedTuple):
    price: jnp.ndarray
    delta: jnp.ndarray
    gamma: jnp.ndarray
    prices: jnp.ndarray     # value on the grid at t=0
    spot_grid: jnp.ndarray
    early_exercise_optimal: jnp.ndarray


def _coeffs(sig, dx, r, q):
    """Per-node operator rows: L = diffusion + advection - r I in log space."""
    sigma2 = sig * sig
    a = 0.5 * sigma2 / (dx * dx)
    b = (r - q - 0.5 * sigma2) / (2.0 * dx)
    return a - b, -2.0 * a - r, a + b  # (L_m, L_c, L_p), each (n,)


def solve(
    vol_fn: Callable,
    S0,
    *,
    K,
    T,
    r=0.0,
    q=0.0,
    is_call=True,
    american: bool = False,
    n_space: int = 200,
    n_time: int = 100,
    s_min_mult: float = 0.2,
    s_max_mult: float = 5.0,
    scheme: str = "crank_nicolson",
) -> LVPDEResult:
    """Backward CN march under ``sigma = vol_fn(s_grid, t_calendar)``.

    ``vol_fn`` maps (spot-level array (n,), scalar calendar time t in
    [0, T]) -> per-node vols (n,); pass a
    :class:`~pde_tpu.models.local_vol.SurfaceInterpolator` for a Dupire
    surface, or ``lambda s, t: jnp.full_like(s, sig)`` to recover bs_pde
    (regression-tested).  American exercise by per-step projection (the
    bs_pde/reference treatment).  jit-compatible: wrap the call in
    ``jax.jit`` with ``vol_fn`` captured in the closure.
    """
    s_grid = jnp.exp(
        jnp.linspace(jnp.log(K * s_min_mult), jnp.log(K * s_max_mult), n_space)
    )
    dx = jnp.log(s_grid[-1] / s_grid[0]) / (n_space - 1)
    dt = T / n_time
    w = {"crank_nicolson": 0.5, "implicit": 1.0}[scheme]

    payoff = jnp.where(
        jnp.asarray(is_call), jnp.maximum(s_grid - K, 0.0),
        jnp.maximum(K - s_grid, 0.0),
    )
    idx = jnp.arange(n_space)
    is_interior = (idx > 0) & (idx < n_space - 1)

    def apply_bc(V, tau):
        # Dirichlet with both discounts over time-to-expiry (the bs_pde
        # corrected convention, not the reference's calendar-time defect)
        df_r = jnp.exp(-r * tau)
        df_q = jnp.exp(-q * tau)
        call_q = jnp.asarray(is_call)
        lo = jnp.where(call_q, 0.0, K * df_r - s_grid[0] * df_q)
        hi = jnp.where(call_q, s_grid[-1] * df_q - K * df_r, 0.0)
        return V.at[0].set(lo).at[-1].set(hi)

    def step(V, tau):
        # implicit side at the new time level (time-to-expiry tau), explicit
        # side at the old one — Rannacher-free CN, same as bs_pde
        sig_new = vol_fn(s_grid, T - tau)
        L_m_n, L_c_n, L_p_n = _coeffs(sig_new, dx, r, q)
        if w < 1.0:
            sig_old = vol_fn(s_grid, jnp.minimum(T - tau + dt, T))
            L_m_o, L_c_o, L_p_o = _coeffs(sig_old, dx, r, q)
            LV = (L_m_o[1:-1] * V[:-2] + L_c_o[1:-1] * V[1:-1]
                  + L_p_o[1:-1] * V[2:])
            rhs = V.at[1:-1].add((1.0 - w) * dt * LV)
        else:
            rhs = V
        diag = jnp.where(is_interior, 1.0 - w * dt * L_c_n, 1.0)
        lower = jnp.where(is_interior[1:], -w * dt * L_m_n[1:], 0.0)
        upper = jnp.where(is_interior[:-1], -w * dt * L_p_n[:-1], 0.0)
        V = tridiagonal_solve(lower, diag, upper, rhs)
        V = apply_bc(V, tau)
        if american:
            V = jnp.maximum(V, payoff)
        return V, None

    taus = dt * jnp.arange(1, n_time + 1, dtype=s_grid.dtype)
    V, _ = jax.lax.scan(step, payoff, taus)

    price = grids.interp_linear(s_grid, V, S0)
    i = jnp.clip(grids.find_index(s_grid, S0), 1, n_space - 2)
    delta = (V[i + 1] - V[i - 1]) / (s_grid[i + 1] - s_grid[i - 1])
    davg = 0.5 * (s_grid[i + 1] - s_grid[i - 1])
    gamma = (V[i + 1] - 2.0 * V[i] + V[i - 1]) / (davg * davg)
    payoff_s0 = jnp.where(
        jnp.asarray(is_call), jnp.maximum(S0 - K, 0.0),
        jnp.maximum(K - S0, 0.0),
    )
    early_ex = jnp.asarray(american) & (price > payoff_s0 + 1e-10)
    return LVPDEResult(price, delta, gamma, V, s_grid, early_ex)
