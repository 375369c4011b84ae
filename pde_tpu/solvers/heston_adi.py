"""Heston 2D PDE solver — Douglas ADI in log-spot coordinates, TPU-native.

Covers the role of the reference HestonPDESolver
(src/cpp/solvers/heston_pde.hpp) — 2D (S, v) finite differences, ADI
splitting with the mixed derivative explicit, per-step ``max(V, payoff)`` for
American exercise — but is a ground-up redesign, for two reasons:

**Correctness.** The reference scheme converges to a biased price (~6% high
for the canonical test set heston.cpp uses): its linear-extrapolation
boundary at both v edges (heston_pde.hpp:471-478) and its S_max condition
without the dividend discount (heston_pde.hpp:462-467) contaminate the
interior.  This was established by grid-refinement against the true price
from three independent methods (adaptive Carr-Madan quadrature, the Heston
P1/P2 representation, and the FFT pricer).  This solver instead uses
In 't Hout & Foulon (2010) boundary treatment:

* v = 0 is a PDE row: V_t + (r-q)S V_S + kappa*theta*V_v - rV = 0 with a
  one-sided difference for V_v (the diffusion vanishes at v = 0);
* v = v_max: Dirichlet V = S e^{-q tau} (call) / K e^{-r tau} (put);
* S boundaries: Dirichlet with both discounts, V(S_max) = S_max e^{-q tau}
  - K e^{-r tau}.

Validated: 100x50x100 grid prices the canonical ATM call to 0.17% of truth
(the reference: 5.5%), converging under refinement.

**TPU shape.**  Log-spot coordinates make the S operator constant-coefficient
per v level (uniform dx); all nv implicit S systems solve as ONE batched
Thomas call riding the VPU lanes, all nS v systems likewise (the v operator
is S-independent, one set of diagonals broadcast over rows); the time march
is a ``lax.scan``.  All model/contract inputs (kappa..v0, r, q, T, K,
is_call, S0) are TRACED, so :func:`solve_batch` vmaps whole option surfaces
— mixed strikes, maturities, parameters, calls and puts — through one
compiled march, and the batch axis shards over the ``dp`` mesh axis for
multi-chip pricing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import grids
from ..ops.tridiag import thomas_factor, thomas_solve_factored

__all__ = [
    "HestonPDEParams",
    "HestonPDEResult",
    "solve",
    "solve_fused",
    "solve_batch",
    "solve_fused_batch",
    "greeks_ad",
]


class HestonPDEParams(NamedTuple):
    """Inputs (grid defaults match the reference, heston_pde.hpp:56-61)."""

    kappa: float = 2.0
    theta: float = 0.04
    sigma: float = 0.3
    rho: float = -0.7
    v0: float = 0.04
    r: float = 0.05
    q: float = 0.0
    T: float = 1.0
    K: float = 100.0
    is_call: bool = True
    american: bool = False
    n_spot: int = 100
    n_vol: int = 50
    n_time: int = 100
    s_min_mult: float = 0.2
    s_max_mult: float = 5.0
    v_max: float = 1.0
    # American exercise: "projection" = per-step max(V, payoff) (the
    # reference's splitting, heston_pde.hpp:143-150); "it_lcp" = Ikonen-
    # Toivanen operator splitting with an explicit exercise-premium
    # multiplier — the rigorous LCP treatment for ADI schemes
    american_method: str = "projection"
    # ADI splitting family: "douglas" (default; this build's scheme),
    # "craig_sneyd" — the reference's family (explicit mixed step + second
    # corrector pass, heston_pde.hpp:245-248) — or "hv"
    # (Hundsdorfer-Verwer: full-operator corrector with the second sweep
    # pair anchored at the predictor; second-order including the mixed
    # term, the strongest damping of the three).  Identical stable limits
    # for these coefficients; CS/HV cost one extra pair of implicit sweeps
    # per step for formally better time accuracy on the mixed term.
    scheme: str = "douglas"


class HestonPDEResult(NamedTuple):
    price: jnp.ndarray
    delta: jnp.ndarray
    gamma: jnp.ndarray
    vega: jnp.ndarray
    theta: jnp.ndarray
    prices: jnp.ndarray  # V(S, v) at t=0
    spot_grid: jnp.ndarray
    vol_grid: jnp.ndarray


def _a1_diags(v_grid, dx, r, q):
    """S-direction (log-coordinate) operator rows for every v level.

    A1 = 0.5 v V_xx + (r - q - 0.5 v) V_x - 0.5 r V on interior rows;
    boundary rows are zero (Dirichlet values are reimposed each step).
    Returns (lower, diag, upper) with shapes (nv, nS-1), (nv, nS), (nv, nS-1)
    ready to batch over the v axis.
    """
    a = 0.5 * v_grid / (dx * dx)  # (nv,)
    b = (r - q - 0.5 * v_grid) / (2.0 * dx)
    lo_val = (a - b)[:, None]
    di_val = (-2.0 * a - 0.5 * r)[:, None]
    up_val = (a + b)[:, None]
    return lo_val, di_val, up_val  # interior coefficient values, constant per row


def _a2_diags(v_grid, dv, kappa, theta, sigma, r):
    """v-direction operator (identical for every S row).

    Interior: 0.5 sigma^2 v V_vv + kappa(theta - v) V_v - 0.5 r V.  The
    convection term is central where the scheme stays an M-matrix
    (diffusion >= |convection| * dv / 2) and first-order upwind at nodes
    where it would not — without this, convection-dominated regimes (small
    vol-of-vol, large kappa, the far-v region) feed central-differencing
    oscillations through the whole surface (observed: a 200x60 grid pricing
    an ATM call at -0.94 with sigma = 0.01).
    v = 0 row: kappa*theta * one-sided V_v - 0.5 r V.
    v = v_max row: zero (Dirichlet).
    Returns dense diagonals of shape (nv-1,), (nv,), (nv-1,).
    """
    nv = v_grid.shape[0]
    vj = v_grid[1:-1]
    d = 0.5 * sigma * sigma * vj / (dv * dv)
    adv = kappa * (theta - vj) / (2.0 * dv)

    central_ok = d >= jnp.abs(adv)
    up = adv > 0.0  # convection pushes toward larger v
    lo_j = jnp.where(central_ok, d - adv, jnp.where(up, d, d - 2.0 * adv))
    up_j = jnp.where(central_ok, d + adv, jnp.where(up, d + 2.0 * adv, d))
    di_j = -(lo_j + up_j)  # row sum zero before the -r/2 discount term

    lower = jnp.zeros(nv - 1).at[:-1].set(lo_j)
    diag = jnp.zeros(nv).at[1:-1].set(di_j - 0.5 * r)
    upper = jnp.zeros(nv - 1).at[1:].set(up_j)

    # v = 0 boundary row: first-order one-sided convection (diffusion is 0)
    c = kappa * theta / dv
    diag = diag.at[0].set(-c - 0.5 * r)
    upper = upper.at[0].set(c)
    # v = v_max: Dirichlet row stays zero
    return lower, diag, upper


def _assemble_a1(nS, nv, lo_val, di_val, up_val):
    """Expand per-level constants into batched tridiagonals (nv, nS*)."""
    interior = ((jnp.arange(nS) > 0) & (jnp.arange(nS) < nS - 1)).astype(lo_val.dtype)
    lower = jnp.broadcast_to(lo_val, (nv, nS - 1)) * interior[1:]
    diag = jnp.broadcast_to(di_val, (nv, nS)) * interior
    upper = jnp.broadcast_to(up_val, (nv, nS - 1)) * interior[:-1]
    return lower, diag, upper


def _apply_a1(V, lower, diag, upper):
    """A1 V with the batched-diagonal representation (systems along axis 0 of V)."""
    out = diag.T * V
    out = out.at[1:, :].add(lower.T * V[:-1, :])
    out = out.at[:-1, :].add(upper.T * V[1:, :])
    return out


def _apply_a2(V, lower, diag, upper):
    """A2 V, acting along the v axis (axis 1); same diagonals for all rows."""
    out = V * diag[None, :]
    out = out.at[:, 1:].add(V[:, :-1] * lower[None, :])
    out = out.at[:, :-1].add(V[:, 1:] * upper[None, :])
    return out


def _apply_a0(V, v_grid, dx, dv, rho, sigma):
    """Mixed-derivative term rho sigma v V_xv (explicit only)."""
    V_xv = (V[2:, 2:] - V[2:, :-2] - V[:-2, 2:] + V[:-2, :-2]) / (4.0 * dx * dv)
    out = rho * sigma * v_grid[None, 1:-1] * V_xv
    return jnp.pad(out, ((1, 1), (1, 1)))


def _solve_core(
    kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0,
    *,
    american: bool,
    american_method: str,
    n_spot: int,
    n_vol: int,
    n_time: int,
    s_min_mult: float,
    s_max_mult: float,
    v_max: float,
    remat: bool = False,
    scheme: str = "douglas",
):
    """The march with every model/contract input TRACED (only grid sizes and
    the American mode are static) — the vmap/shard-able core."""
    nS, nv, nT = n_spot, n_vol, n_time
    is_call = jnp.asarray(is_call)
    x = jnp.linspace(jnp.log(K * s_min_mult), jnp.log(K * s_max_mult), nS)
    s_grid = jnp.exp(x)
    dx = (x[-1] - x[0]) / (nS - 1)
    v_grid = jnp.linspace(0.0, v_max, nv)
    dv = v_max / (nv - 1)
    dt = T / nT
    th = 0.5  # Douglas parameter

    payoff_1d = jnp.where(
        is_call, jnp.maximum(s_grid - K, 0.0), jnp.maximum(K - s_grid, 0.0)
    )
    payoff = jnp.broadcast_to(payoff_1d[:, None], (nS, nv))

    lo_v, di_v, up_v = _a1_diags(v_grid, dx, r, q)
    a1_lower, a1_diag, a1_upper = _assemble_a1(nS, nv, lo_v, di_v, up_v)
    a2_lower, a2_diag, a2_upper = _a2_diags(v_grid, dv, kappa, theta, sigma, r)

    # implicit system diagonals (I - th dt A)
    i1_lower = -th * dt * a1_lower
    i1_diag = 1.0 - th * dt * a1_diag
    i1_upper = -th * dt * a1_upper
    i2_lower = -th * dt * a2_lower
    i2_diag = 1.0 - th * dt * a2_diag
    i2_upper = -th * dt * a2_upper

    def apply_bc(V, tau):
        """Dirichlet boundaries at time-to-expiry tau (In 't Hout-Foulon)."""
        df_r = jnp.exp(-r * tau)
        df_q = jnp.exp(-q * tau)
        V = V.at[0, :].set(jnp.where(is_call, 0.0, K * df_r - s_grid[0] * df_q))
        V = V.at[-1, :].set(jnp.where(is_call, s_grid[-1] * df_q - K * df_r, 0.0))
        V = V.at[:, -1].set(jnp.where(is_call, s_grid * df_q, K * df_r))
        return V

    # both sweep operators are time-independent: Thomas-factorize once so
    # every step's serial chains are multiply/fma-only
    i1_factors = thomas_factor(i1_lower, i1_diag, i1_upper)
    i2_factors = thomas_factor(i2_lower, i2_diag, i2_upper)

    def _sweeps(Y0, a1V, a2V):
        rhs1 = Y0 - th * dt * a1V
        Y1 = thomas_solve_factored(i1_factors, rhs1.T).T
        rhs2 = Y1 - th * dt * a2V
        return thomas_solve_factored(i2_factors, rhs2)

    def adi_step(V, source):
        """Douglas splitting: explicit full step, then implicit x and v
        sweeps; Craig-Sneyd adds a mixed-term corrector + second sweep pair
        (the reference's family, heston_pde.hpp:245-248).

        ``source`` carries the Ikonen-Toivanen exercise-premium multiplier
        (zero for European / projection mode)."""
        a0V = _apply_a0(V, v_grid, dx, dv, rho, sigma)
        a1V = _apply_a1(V, a1_lower, a1_diag, a1_upper)
        a2V = _apply_a2(V, a2_lower, a2_diag, a2_upper)
        Y0 = V + dt * (a0V + a1V + a2V + source)

        Y2 = _sweeps(Y0, a1V, a2V)
        if scheme == "craig_sneyd":
            # corrector: re-evaluate the EXPLICIT (mixed) operator at the
            # predictor and redo both implicit sweeps (lambda = 1/2)
            a0Y = _apply_a0(Y2, v_grid, dx, dv, rho, sigma)
            Y0_tilde = Y0 + 0.5 * dt * (a0Y - a0V)
            Y2 = _sweeps(Y0_tilde, a1V, a2V)
        elif scheme == "hv":
            # Hundsdorfer-Verwer: re-evaluate the FULL operator at the
            # predictor (mu = 1/2) and run the second implicit sweep pair
            # anchored at the predictor, not at V — second-order in time
            # including the mixed term, with stronger damping than
            # Craig-Sneyd (In 't Hout & Foulon 2010, scheme (2.9))
            a0Y = _apply_a0(Y2, v_grid, dx, dv, rho, sigma)
            a1Y = _apply_a1(Y2, a1_lower, a1_diag, a1_upper)
            a2Y = _apply_a2(Y2, a2_lower, a2_diag, a2_upper)
            Y0_tilde = Y0 + 0.5 * dt * (
                (a0Y + a1Y + a2Y) - (a0V + a1V + a2V)
            )
            Y2 = _sweeps(Y0_tilde, a1Y, a2Y)
        return Y2

    use_it = american and american_method == "it_lcp"

    def step(carry, tau):
        V, lam = carry
        Vt = adi_step(V, lam)
        if use_it:
            # Ikonen-Toivanen update: find (V_new, lam_new) with
            # V_new - dt lam_new = Vt - dt lam, V_new >= g, lam_new >= 0,
            # lam_new (V_new - g) = 0
            W = Vt - dt * lam
            V_new = jnp.maximum(payoff, W)
            lam = (V_new - W) / dt
            Vt = V_new
        Vt = apply_bc(Vt, tau)
        if american and not use_it:
            Vt = jnp.maximum(Vt, payoff)
        if use_it:
            # the Dirichlet/extrapolation boundaries are European; an
            # American value can never fall below intrinsic there
            Vt = Vt.at[0, :].set(jnp.maximum(Vt[0, :], payoff[0, :]))
            Vt = Vt.at[-1, :].set(jnp.maximum(Vt[-1, :], payoff[-1, :]))
            Vt = Vt.at[:, 0].set(jnp.maximum(Vt[:, 0], payoff[:, 0]))
            Vt = Vt.at[:, -1].set(jnp.maximum(Vt[:, -1], payoff[:, -1]))
        return (Vt, lam), None

    taus = dt * jnp.arange(1, nT + 1, dtype=s_grid.dtype)
    # remat: recompute each ADI step on the backward pass instead of saving
    # all nT grids — O(1) activation memory for adjoint Greeks on big grids
    step_fn = jax.checkpoint(step) if remat else step
    (V, _), _ = jax.lax.scan(step_fn, (payoff, jnp.zeros_like(payoff)), taus)

    price = grids.interp_bilinear(s_grid, v_grid, V, S0, v0)

    i = jnp.clip(grids.find_index(s_grid, S0), 1, nS - 2)
    j = jnp.clip(grids.find_index(v_grid, v0), 1, nv - 2)
    delta = (V[i + 1, j] - V[i - 1, j]) / (s_grid[i + 1] - s_grid[i - 1])
    dS_m = s_grid[i] - s_grid[i - 1]
    dS_p = s_grid[i + 1] - s_grid[i]
    davg = 0.5 * (dS_m + dS_p)
    gamma = (V[i + 1, j] - 2.0 * V[i, j] + V[i - 1, j]) / (davg * davg)
    dV_dv = (V[i, j + 1] - V[i, j - 1]) / (2.0 * dv)
    # vega ~ 2 sqrt(v0) T dV/dv (chain rule, same convention as the reference
    # heston_pde.hpp:534-547)
    vega = 2.0 * jnp.sqrt(v0) * T * dV_dv
    theta_g = -(
        _apply_a0(V, v_grid, dx, dv, rho, sigma)
        + _apply_a1(V, a1_lower, a1_diag, a1_upper)
        + _apply_a2(V, a2_lower, a2_diag, a2_upper)
    )[i, j]

    return HestonPDEResult(price, delta, gamma, vega, theta_g, V, s_grid, v_grid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "american", "american_method", "n_spot", "n_vol", "n_time",
        "s_min_mult", "s_max_mult", "v_max", "scheme",
    ),
)
def _solve_impl(kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0, *,
                american, american_method, n_spot, n_vol, n_time,
                s_min_mult, s_max_mult, v_max, scheme="douglas"):
    # every model/contract input is TRACED (only grid sizes and the American
    # mode are static) — repricing with new parameters reuses the compiled
    # march instead of paying a multi-second XLA compile per quote
    return _solve_core(
        kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0,
        american=american, american_method=american_method,
        n_spot=n_spot, n_vol=n_vol, n_time=n_time,
        s_min_mult=s_min_mult, s_max_mult=s_max_mult, v_max=v_max,
        scheme=scheme,
    )


def _validate_params(params: HestonPDEParams) -> None:
    if params.kappa <= 0 or params.theta <= 0 or params.sigma <= 0:
        raise ValueError("kappa, theta, sigma must be positive")
    if abs(params.rho) >= 1:
        raise ValueError("|rho| must be < 1")
    if params.v0 <= 0 or params.T <= 0 or params.K <= 0:
        raise ValueError("v0, T, K must be positive")
    if params.scheme not in ("douglas", "craig_sneyd", "hv"):
        raise ValueError(f"unknown ADI scheme {params.scheme!r}")


def solve(params: HestonPDEParams, S0) -> HestonPDEResult:
    """Solve the Heston PDE; price/Greeks at (S0, v0).

    jit-compiled with only grid sizes/American mode static, so repricing
    with new model parameters reuses the compiled march; vmap over S0 for
    batches, or use :func:`solve_batch` to batch over ALL inputs.
    """
    _validate_params(params)
    return _solve_impl(
        params.kappa, params.theta, params.sigma, params.rho, params.v0,
        params.r, params.q, params.T, params.K, params.is_call, S0,
        american=params.american, american_method=params.american_method,
        n_spot=params.n_spot, n_vol=params.n_vol, n_time=params.n_time,
        s_min_mult=params.s_min_mult, s_max_mult=params.s_max_mult,
        v_max=params.v_max, scheme=params.scheme,
    )


def solve_fused(params: HestonPDEParams, S0, interpret: bool = False) -> HestonPDEResult:
    """Solve via the fully-fused Pallas march (ops/adi_fused.py).

    The entire time loop runs inside ONE TPU kernel with the grid and all
    sweep scratch VMEM-resident — ~6-8 us/step vs ~36 us/step for the
    `solve` scan path on v5e (4-6x), agreeing to f32 accumulation
    tolerance.  Supports European and American in both projection and
    Ikonen-Toivanen modes (autodiff stays on the scan path).
    ``interpret=True`` runs the kernel in interpreter mode for CPU tests.

    NOTE: params are compile-time constants here (the kernel specializes on
    them), so each parameter set pays one compile — use
    :func:`solve_fused_batch`, which traces every model/contract input, to
    price varying quotes without recompiling.
    """
    if params.american and params.american_method not in ("projection", "it_lcp"):
        raise ValueError(
            "solve_fused supports american_method 'projection' or 'it_lcp'"
        )
    if params.scheme != "douglas":
        raise ValueError("the fused kernel implements the Douglas scheme; "
                         "use solve() for craig_sneyd")
    _validate_params(params)
    return _solve_fused_impl(params, S0, interpret)


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def _solve_fused_impl(p: HestonPDEParams, S0, interpret: bool) -> HestonPDEResult:
    from ..ops.adi_fused import fused_douglas_march
    import math

    nS, nv, nT = p.n_spot, p.n_vol, p.n_time
    x = jnp.linspace(jnp.log(p.K * p.s_min_mult), jnp.log(p.K * p.s_max_mult), nS)
    s_grid = jnp.exp(x)
    dx = (math.log(p.s_max_mult) - math.log(p.s_min_mult)) / (nS - 1)
    v_grid = jnp.linspace(0.0, p.v_max, nv)
    dv = p.v_max / (nv - 1)
    dt = p.T / nT
    th = 0.5

    payoff_1d = jnp.where(
        p.is_call, jnp.maximum(s_grid - p.K, 0.0), jnp.maximum(p.K - s_grid, 0.0)
    )
    payoff = jnp.broadcast_to(payoff_1d[:, None], (nS, nv))

    lo_v, di_v, up_v = _a1_diags(v_grid, dx, p.r, p.q)
    a1_lower, a1_diag, a1_upper = _assemble_a1(nS, nv, lo_v, di_v, up_v)
    a2_lower, a2_diag, a2_upper = _a2_diags(v_grid, dv, p.kappa, p.theta, p.sigma, p.r)

    # row-aligned (nS, nv) layouts: band[i] multiplies the value shifted INTO
    # row i (zero where the shift runs off the grid)
    def row_align(lower, diag, upper):
        L = jnp.zeros((nS, nv)).at[1:, :].set(lower.T)
        U = jnp.zeros((nS, nv)).at[:-1, :].set(upper.T)
        return L, diag.T, U

    a1L, a1D, a1U = row_align(a1_lower, a1_diag, a1_upper)
    i1L, i1D, i1U = row_align(-th*dt*a1_lower, 1.0 - th*dt*a1_diag, -th*dt*a1_upper)

    def v_align(lower, diag, upper):
        L = jnp.zeros(nv).at[1:].set(lower)   # multiplies V[:, j-1]
        U = jnp.zeros(nv).at[:-1].set(upper)  # multiplies V[:, j+1]
        return L, diag, U

    a2L, a2D, a2U = v_align(a2_lower, a2_diag, a2_upper)
    i2L, i2D, i2U = v_align(-th*dt*a2_lower, 1.0 - th*dt*a2_diag, -th*dt*a2_upper)

    mix = (p.rho * p.sigma / (4.0 * dx * dv)) * v_grid
    use_it = p.american and p.american_method == "it_lcp"
    scalars = jnp.asarray(
        [dt, p.r, p.q, p.K, float(bool(p.is_call)), float(bool(p.american)),
         float(use_it)]
    )

    V = fused_douglas_march(
        payoff, (a1L, a1D, a1U), (i1L, i1D, i1U), (a2L, a2D, a2U),
        (i2L, i2D, i2U), mix, s_grid, scalars,
        n_spot=nS, n_vol=nv, n_time=nT, interpret=interpret,
    ).astype(s_grid.dtype)

    price = grids.interp_bilinear(s_grid, v_grid, V, S0, p.v0)
    i = jnp.clip(grids.find_index(s_grid, S0), 1, nS - 2)
    j = jnp.clip(grids.find_index(v_grid, p.v0), 1, nv - 2)
    delta = (V[i + 1, j] - V[i - 1, j]) / (s_grid[i + 1] - s_grid[i - 1])
    davg = 0.5 * (s_grid[i + 1] - s_grid[i - 1])
    gamma = (V[i + 1, j] - 2.0 * V[i, j] + V[i - 1, j]) / (davg * davg)
    dV_dv = (V[i, j + 1] - V[i, j - 1]) / (2.0 * dv)
    vega = 2.0 * jnp.sqrt(p.v0) * p.T * dV_dv
    theta_g = -(
        _apply_a0(V, v_grid, dx, dv, p.rho, p.sigma)
        + _apply_a1(V, a1_lower, a1_diag, a1_upper)
        + _apply_a2(V, a2_lower, a2_diag, a2_upper)
    )[i, j]
    return HestonPDEResult(price, delta, gamma, vega, theta_g, V, s_grid, v_grid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "american", "american_method", "n_spot", "n_vol", "n_time",
        "s_min_mult", "s_max_mult", "v_max", "remat",
    ),
)
def greeks_ad(
    kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0,
    american: bool = False,
    american_method: str = "projection",
    n_spot: int = 100,
    n_vol: int = 50,
    n_time: int = 100,
    s_min_mult: float = 0.2,
    s_max_mult: float = 5.0,
    v_max: float = 1.0,
    remat: bool = False,
):
    """Adjoint (reverse-mode AD) sensitivities through the full ADI march.

    One backward pass differentiates the whole time march — price plus
    NINE exact sensitivities (delta and d/d{kappa, theta, sigma, rho, v0,
    r, q, T}) for ~2x the cost of a forward solve (12 ms at the default
    grid on v5e; AD delta matches central differences to 4 digits).  The
    reference bumps the grid once per Greek (heston_pde.hpp:520-560) —
    first-order error and a full re-solve each.  ``remat=True`` recomputes
    steps on the backward pass (O(1) activation memory) for very large
    grids.  Returns a dict: price, delta, and d_<param> entries.
    """
    core = functools.partial(
        _solve_core,
        american=american, american_method=american_method,
        n_spot=n_spot, n_vol=n_vol, n_time=n_time,
        s_min_mult=s_min_mult, s_max_mult=s_max_mult, v_max=v_max,
        remat=remat,
    )

    def price_fn(kappa, theta, sigma, rho, v0, r, q, T, S0):
        return core(kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0).price

    price, grads = jax.value_and_grad(price_fn, argnums=tuple(range(9)))(
        kappa, theta, sigma, rho, v0, r, q, T, S0
    )
    names = ("d_kappa", "d_theta", "d_sigma", "d_rho", "d_v0", "d_r", "d_q", "d_T")
    out = {"price": price, "delta": grads[8]}
    out.update(dict(zip(names, grads[:8])))
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "american", "american_method", "n_spot", "n_vol", "n_time",
        "s_min_mult", "s_max_mult", "v_max",
    ),
)
def solve_batch(
    kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0,
    american: bool = False,
    american_method: str = "projection",
    n_spot: int = 100,
    n_vol: int = 50,
    n_time: int = 100,
    s_min_mult: float = 0.2,
    s_max_mult: float = 5.0,
    v_max: float = 1.0,
) -> HestonPDEResult:
    """Price a whole BATCH of PDE problems in one compiled program.

    Every array argument broadcasts against the others along one leading
    batch axis — mixed strikes, maturities, rates, Heston parameters, spot
    levels, calls AND puts (``is_call`` is traced) all march together; only
    the grid sizes and the American mode are static.  The batch axis is
    embarrassingly parallel: shard it over the ``dp`` mesh axis
    (``jax.device_put`` with a ``NamedSharding(mesh, P("dp"))``) and XLA
    runs each shard's marches locally with zero communication — the PDE
    counterpart of the sharded calibration step (parallel/mesh.py).

    The reference prices one option per HestonPDESolver instance in a C++
    loop (heston_pde.hpp:56-150); this is the whole-desk replacement.
    """
    args = [jnp.atleast_1d(jnp.asarray(a)) for a in
            (kappa, theta, sigma, rho, v0, r, q, T, K)]
    is_call = jnp.atleast_1d(jnp.asarray(is_call))
    S0 = jnp.atleast_1d(jnp.asarray(S0))
    n = max(a.shape[0] for a in args + [is_call, S0])
    args = [jnp.broadcast_to(a, (n,)) for a in args]
    is_call = jnp.broadcast_to(is_call, (n,))
    S0 = jnp.broadcast_to(S0, (n,))

    core = functools.partial(
        _solve_core,
        american=american, american_method=american_method,
        n_spot=n_spot, n_vol=n_vol, n_time=n_time,
        s_min_mult=s_min_mult, s_max_mult=s_max_mult, v_max=v_max,
    )
    return jax.vmap(core)(*args, is_call, S0)


def _broadcast_batch(kappa, theta, sigma, rho, v0, r, q, T, K, is_call,
                     S0, american):
    args = [jnp.atleast_1d(jnp.asarray(a, dtype=jnp.float32)) for a in
            (kappa, theta, sigma, rho, v0, r, q, T, K)]
    is_call = jnp.atleast_1d(jnp.asarray(is_call)).astype(jnp.float32)
    american = jnp.atleast_1d(jnp.asarray(american)).astype(jnp.float32)
    S0 = jnp.atleast_1d(jnp.asarray(S0, dtype=jnp.float32))
    n = max(a.shape[0] for a in args + [is_call, S0, american])
    args = [jnp.broadcast_to(a, (n,)) for a in args]
    return (*args, jnp.broadcast_to(is_call, (n,)),
            jnp.broadcast_to(S0, (n,)), jnp.broadcast_to(american, (n,)), n)


@functools.partial(
    jax.jit,
    static_argnames=(
        "use_it", "n_spot", "n_vol", "n_time",
        "s_min_mult", "s_max_mult", "v_max", "interpret", "unroll", "pcr_v", "pcr_s",
    ),
)
def _fused_batch_impl(
    kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0, american,
    use_it, n_spot, n_vol, n_time, s_min_mult, s_max_mult, v_max, interpret,
    unroll, pcr_v, pcr_s,
):
    from ..ops.adi_fused import fused_douglas_march_batched
    import math

    nS, nv, nT = n_spot, n_vol, n_time
    B = kappa.shape[0]
    th = 0.5
    f32 = jnp.float32

    # K-scaled log-spot grid: x = ln(S/K) is SHARED across the batch, so dx
    # (and the S-operator lattice coefficients) are option-independent
    x = jnp.linspace(math.log(s_min_mult), math.log(s_max_mult), nS, dtype=f32)
    dx = (math.log(s_max_mult) - math.log(s_min_mult)) / (nS - 1)
    ex = jnp.exp(x)                                   # (nS,)
    v_grid = jnp.linspace(0.0, v_max, nv, dtype=f32)  # shared v grid
    dv = v_max / (nv - 1)
    dt = (T / nT).astype(f32)                         # (B,)

    sg = ex[:, None] * K[None, :]                     # (nS, B)
    pay = jnp.where(
        is_call[None, :] > 0.5,
        jnp.maximum(ex - 1.0, 0.0)[:, None] * K[None, :],
        jnp.maximum(1.0 - ex, 0.0)[:, None] * K[None, :],
    )

    # explicit S-operator interior coefficients, (nv, B) lane-stacks
    a = 0.5 * v_grid[:, None] / (dx * dx)             # (nv, 1)
    bb = (r - q - 0.5 * v_grid[:, None]) / (2.0 * dx)  # (nv, B)
    a1 = jnp.stack([a - bb, -2.0 * a - 0.5 * r[None, :], a + bb])   # (3,nv,B)
    i1 = jnp.stack([
        -th * dt[None, :] * a1[0],
        1.0 - th * dt[None, :] * a1[1],
        -th * dt[None, :] * a1[2],
    ])

    # v-operator bands per option (vmapped over the batch), row-aligned
    a2lo, a2di, a2up = jax.vmap(
        _a2_diags, in_axes=(None, None, 0, 0, 0, 0)
    )(v_grid, dv, kappa, theta, sigma, r)             # (B, nv-1/nv/nv-1)

    def _v_align_b(lower, diag, upper):
        L = jnp.zeros((B, nv), f32).at[:, 1:].set(lower.astype(f32))
        U = jnp.zeros((B, nv), f32).at[:, :-1].set(upper.astype(f32))
        return L, diag.astype(f32), U

    a2L, a2D, a2U = _v_align_b(a2lo, a2di, a2up)
    i2L, i2D, i2U = _v_align_b(
        -th * dt[:, None] * a2lo,
        1.0 - th * dt[:, None] * a2di,
        -th * dt[:, None] * a2up,
    )
    a2 = jnp.stack([a2L.T, a2D.T, a2U.T])             # (3, nv, B)
    i2 = jnp.stack([i2L.T, i2D.T, i2U.T])

    mix = (rho * sigma / (4.0 * dx * dv))[None, :] * v_grid[:, None]  # (nv,B)
    mix = mix.at[nv - 1, :].set(0.0)                  # j = nv-1 is Dirichlet

    sc = jnp.stack([
        dt, r, q, K, is_call, american,
        jnp.zeros((B,), f32), jnp.zeros((B,), f32),
    ])                                                # (8, B)

    # pad EVERY batch to full 128-lane blocks (repeat lane 0 — any valid
    # lane).  Mosaic pads sub-128 blocks internally too, but measured on
    # v5e a B=108 block marches ~25% slower than the same march on an
    # explicit 128-lane block (3.37 vs 2.97 ms at 100x50x100) — misaligned
    # lane tiles cost every vector op; explicit padding keeps the whole
    # march on aligned tiles
    Bp = ((B + 127) // 128) * 128
    padn = Bp - B

    def padl(arr):
        if padn == 0:
            return arr
        reps = jnp.repeat(arr[..., 0:1], padn, axis=-1)
        return jnp.concatenate([arr, reps], axis=-1)

    V = fused_douglas_march_batched(
        padl(pay[:, None, :]), padl(sg[:, None, :]),
        padl(a1), padl(i1), padl(a2), padl(i2),
        padl(mix[None, :, :]), padl(sc[:, None, :]),
        n_spot=nS, n_vol=nv, n_time=nT, use_it=use_it, interpret=interpret,
        unroll=unroll, pcr_v=pcr_v, pcr_s=pcr_s,
    )[:, :, :B]                                       # (nS, nv, B)

    # price + Greeks per option, on its own grid (same extraction as
    # _solve_core / the reference heston_pde.hpp:481-559)
    def extract(Vb, sgb, kb, tb, sb, rb, v0b, S0b, Tb, rhob, qb):
        price = grids.interp_bilinear(sgb, v_grid, Vb, S0b, v0b)
        i = jnp.clip(grids.find_index(sgb, S0b), 1, nS - 2)
        j = jnp.clip(grids.find_index(v_grid, v0b), 1, nv - 2)
        delta = (Vb[i + 1, j] - Vb[i - 1, j]) / (sgb[i + 1] - sgb[i - 1])
        davg = 0.5 * (sgb[i + 1] - sgb[i - 1])
        gamma = (Vb[i + 1, j] - 2.0 * Vb[i, j] + Vb[i - 1, j]) / (davg * davg)
        dV_dv = (Vb[i, j + 1] - Vb[i, j - 1]) / (2.0 * dv)
        vega = 2.0 * jnp.sqrt(v0b) * Tb * dV_dv
        # theta from the PDE: V_t = -(A0 + A1 + A2) V (same as _solve_core)
        lo_v, di_v, up_v = _a1_diags(v_grid, dx, rb, qb)
        a1l, a1d, a1u = _assemble_a1(nS, nv, lo_v, di_v, up_v)
        a2l, a2d, a2u = _a2_diags(v_grid, dv, kb, tb, sb, rb)
        theta_b = -(
            _apply_a0(Vb, v_grid, dx, dv, rhob, sb)
            + _apply_a1(Vb, a1l, a1d, a1u)
            + _apply_a2(Vb, a2l, a2d, a2u)
        )[i, j]
        return price, delta, gamma, vega, theta_b

    Vt = jnp.transpose(V, (2, 0, 1))                  # (B, nS, nv)
    price, delta, gamma, vega, theta_g = jax.vmap(extract)(
        Vt, sg.T, kappa, theta, sigma, r, v0, S0, T, rho, q
    )
    return HestonPDEResult(price, delta, gamma, vega, theta_g, Vt,
                           sg.T, jnp.broadcast_to(v_grid, (B, nv)))


def solve_fused_batch(
    kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0,
    american=False,
    american_method: str = "projection",
    n_spot: int = 100,
    n_vol: int = 50,
    n_time: int = 100,
    s_min_mult: float = 0.2,
    s_max_mult: float = 5.0,
    v_max: float = 1.0,
    interpret: bool = False,
    unroll=True,
    pcr_v: bool = False,
    pcr_s: bool = False,
) -> HestonPDEResult:
    """Batch PDE pricing through the lane-batched fused Pallas march.

    Same broadcasting contract as :func:`solve_batch` — every array argument
    broadcasts along one leading batch axis, and ``is_call`` AND ``american``
    are per-option — but the whole batch marches inside ONE Pallas kernel
    with the option batch riding the 128 VPU lanes
    (ops/adi_fused.fused_douglas_march_batched): no idle lanes, no per-step
    HBM round-trips, no v-sweep transpose.  ``american_method`` selects the
    projection or Ikonen-Toivanen treatment for the flagged options (IT is a
    separate kernel variant: it allocates the multiplier buffer).

    Greeks: delta/gamma/vega/theta from the grid as in the reference
    (heston_pde.hpp:520-559) and :func:`solve_batch`; use :func:`greeks_ad`
    for exact adjoint sensitivities to the model parameters.

    Sweep variants (the round-5 batch-ceiling investigation,
    docs/performance.md "Lifting the fused-ADI batch ceiling"):
    ``unroll=True`` (default) fully unrolls the Thomas sweep loops —
    Mosaic supports only unroll=1 or full unroll — removing the
    per-iteration loop overhead that dominated the march (bit-exact,
    ~1.4x measured within-run); ``pcr_v=True`` replaces the serial
    v-sweep with parallel cyclic reduction (full-tile shifted fmas,
    ~1e-5 relative difference), and ``pcr_s=True`` does the same for
    the S-sweep — both measured slightly behind the unrolled Thomas on
    v5e but kept as options for other grid shapes.
    """
    if american_method not in ("projection", "it_lcp"):
        raise ValueError(
            "solve_fused_batch supports american_method 'projection' or "
            "'it_lcp'"
        )
    # resolve the kernel-variant flag from the CALLER's american argument,
    # BEFORE it becomes a device array: np_any_flag on a committed array
    # forces a device->host pull, which over the axon tunnel costs an RTT
    # on EVERY pricing call (measured: it dominated the 108-option book's
    # wall clock)
    use_it = american_method == "it_lcp" and bool(np_any_flag(american))
    (kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0, american, _n) = \
        _broadcast_batch(kappa, theta, sigma, rho, v0, r, q, T, K, is_call,
                         S0, american)
    return _fused_batch_impl(
        kappa, theta, sigma, rho, v0, r, q, T, K, is_call, S0, american,
        use_it, n_spot, n_vol, n_time, s_min_mult, s_max_mult, v_max,
        interpret, unroll, pcr_v, pcr_s,
    )


def np_any_flag(arr) -> bool:
    """Host-side any() on a flag array, safe under tracing.

    The flag selects a CODE PATH, so it must resolve at trace time; when the
    array is a tracer (the batch pricer wrapped in an outer jit/vmap) the
    value is unknowable and the conservative answer is True — the masked
    update then handles per-element flags on device.
    """
    import numpy as np

    if isinstance(arr, jax.core.Tracer):
        return True
    return bool(np.any(np.asarray(arr) > 0.5))
