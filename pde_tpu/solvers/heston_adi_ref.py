"""Reference-twin Heston ADI solver: the reference scheme, vectorized in JAX.

This module reproduces ``quant::solvers::HestonPDESolver``
(src/cpp/solvers/heston_pde.hpp:103-559) to float64 round-off — including its
quirks and defects — as a committed-golden parity oracle
(tests/golden/reference_pde_values.json).  It exists for parity testing and
scheme comparison only; price with :mod:`pde_tpu.solvers.heston_adi`, whose
Douglas/Craig-Sneyd schemes with In 't Hout-Foulon boundaries converge to the
semi-analytic price (~0.2% at the default grid vs the reference's ~6% call /
~18% put bias — see docs/parity_map.md).

Reference behaviours deliberately replicated here:

1. **The Craig-Sneyd correction is a no-op** (heston_pde.hpp:204,245-248):
   ``theta_adi = 0.5`` makes the final ``(0.5 - theta_adi) * dt * (F0(Y2) -
   F0(V))`` term exactly zero, so the reference integrates with the *Douglas*
   scheme while paying one extra full-operator evaluation per step.  (We skip
   computing the zero term; the product is algebraically 0.)
2. **Implicit/explicit v-advection mismatch** (heston_pde.hpp:395-407 vs
   :427-436): the implicit v-matrix upwinds the kappa*(theta-v) advection but
   the explicit ``A2(V^n)`` subtracted from the rhs uses central differences.
3. **Boundary discounting over calendar time** (heston_pde.hpp:153-154,
   :444-479): Dirichlet S-boundaries discount K over t = (n_time-step-1)*dt,
   which reaches ZERO discount at t=0 — a non-converging deep-ITM error —
   and the S_max call boundary carries no dividend discount on the S leg.
4. **v-boundary linear extrapolation** rows applied after the S rows, so
   corners take the extrapolated value.
5. **Nearest-index clamped readout** (heston_pde.hpp:481-505): ``find_index``
   returns the *nearest* grid point and the bilinear weights are clamped to
   [0, 1], so a spot nearer its left neighbour reads the *grid-point value*
   (t_S clamps to 1), not an interpolant — at the default grid this alone
   biases the canonical ATM call ~0.5 low.
6. **Greeks from nearest-index stencils** (:507-533, :535-547): delta/gamma at
   the nearest (i, j) with no sub-cell interpolation; vega via the
   ``2*sqrt(v0)*T*dV/dv`` chain-rule approximation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .heston_adi import HestonPDEParams, HestonPDEResult

__all__ = ["solve_reference"]


def _nearest_index(grid, x):
    """Grid1D::find_index (pde_core.hpp:101-118): nearest grid point."""
    lo = jnp.clip(jnp.searchsorted(grid, x, side="right") - 1, 0, grid.shape[0] - 2)
    nearest = jnp.where(x - grid[lo] < grid[lo + 1] - x, lo, lo + 1)
    return jnp.where(x <= grid[0], 0,
                     jnp.where(x >= grid[-1], grid.shape[0] - 1, nearest))


@functools.partial(
    jax.jit,
    static_argnames=("n_spot", "n_vol", "n_time", "is_call", "american"),
)
def _solve_ref(kappa, theta, sigma, rho, v0, r, q, T, K, S0,
               s_min_mult, s_max_mult, v_max,
               n_spot, n_vol, n_time, is_call, american):
    nS, nv = n_spot, n_vol
    f64 = jnp.promote_types(jnp.asarray(K).dtype, jnp.float32)

    S = jnp.exp(jnp.linspace(jnp.log(K * s_min_mult), jnp.log(K * s_max_mult), nS))
    v = jnp.linspace(1e-6, v_max, nv)

    dS_m = S[1:-1] - S[:-2]        # (nS-2,)
    dS_p = S[2:] - S[1:-1]
    dS_avg = 0.5 * (dS_m + dS_p)
    dv_m = v[1:-1] - v[:-2]        # (nv-2,)
    dv_p = v[2:] - v[1:-1]
    dv_avg = 0.5 * (dv_m + dv_p)

    dt = T / n_time
    theta_adi = 0.5

    payoff_S = jnp.where(is_call, jnp.maximum(S - K, 0.0), jnp.maximum(K - S, 0.0))
    payoff = jnp.broadcast_to(payoff_S[:, None], (nS, nv))

    Si = S[1:-1][:, None]          # (nS-2, 1) interior spot
    vj = v[1:-1][None, :]          # (1, nv-2) interior variance

    def full_operator(V):
        """compute_full_operator (heston_pde.hpp:254-297); zero on boundary."""
        Vc = V[1:-1, 1:-1]
        V_SS = ((V[2:, 1:-1] - Vc) / dS_p[:, None]
                - (Vc - V[:-2, 1:-1]) / dS_m[:, None]) / dS_avg[:, None]
        V_vv = ((V[1:-1, 2:] - Vc) / dv_p[None, :]
                - (Vc - V[1:-1, :-2]) / dv_m[None, :]) / dv_avg[None, :]
        V_S = (V[2:, 1:-1] - V[:-2, 1:-1]) / (dS_m + dS_p)[:, None]
        V_v = (V[1:-1, 2:] - V[1:-1, :-2]) / (dv_m + dv_p)[None, :]
        V_Sv = (V[2:, 2:] - V[2:, :-2] - V[:-2, 2:] + V[:-2, :-2]) / (
            (dS_m + dS_p)[:, None] * (dv_m + dv_p)[None, :]
        )
        interior = (0.5 * vj * Si * Si * V_SS
                    + rho * sigma * vj * Si * V_Sv
                    + 0.5 * sigma * sigma * vj * V_vv
                    + (r - q) * Si * V_S
                    + kappa * (theta - vj) * V_v
                    - r * Vc)
        return jnp.zeros_like(V).at[1:-1, 1:-1].set(interior)

    # ---- S-direction operator (heston_pde.hpp:300-366), batched over j ----
    diff_S = 0.5 * vj.T * (Si.T ** 2)               # (nv-2, nS-2): 0.5 v S^2
    a_m_S = diff_S / (dS_m * dS_avg)[None, :]
    a_p_S = diff_S / (dS_p * dS_avg)[None, :]
    a_c_S = -(a_m_S + a_p_S)
    adv_S = (r - q) * Si.T                           # (1, nS-2)
    b_m_S = -adv_S / (dS_m + dS_p)[None, :]
    b_p_S = adv_S / (dS_m + dS_p)[None, :]

    dtt = dt * theta_adi
    # tridiagonal bands, identity boundary rows (build_S_operator :334-338)
    diag_S = jnp.ones((nv - 2, nS)).at[:, 1:-1].add(-dtt * a_c_S)
    lower_S = jnp.zeros((nv - 2, nS - 1)).at[:, :-1].set(-dtt * (a_m_S + b_m_S))
    upper_S = jnp.zeros((nv - 2, nS - 1)).at[:, 1:].set(-dtt * (a_p_S + b_p_S))

    def apply_A1(V):
        """apply_S_operator (:344-366): diff*V_SS + adv*V_S, no -rV."""
        Vc = V[1:-1, 1:-1]
        V_SS = ((V[2:, 1:-1] - Vc) / dS_p[:, None]
                - (Vc - V[:-2, 1:-1]) / dS_m[:, None]) / dS_avg[:, None]
        V_S = (V[2:, 1:-1] - V[:-2, 1:-1]) / (dS_m + dS_p)[:, None]
        out = 0.5 * vj * Si * Si * V_SS + (r - q) * Si * V_S
        return jnp.zeros_like(V).at[1:-1, 1:-1].set(out)

    # ---- v-direction operator (:369-416), batched over i ----
    diff_v = 0.5 * sigma * sigma * vj                # (1, nv-2)
    a_m_v = diff_v / (dv_m * dv_avg)[None, :]
    a_p_v = diff_v / (dv_p * dv_avg)[None, :]
    a_c_v = -(a_m_v + a_p_v)
    adv_v = kappa * (theta - vj)                     # (1, nv-2)
    pos = adv_v >= 0
    b_m_v = jnp.where(pos, -adv_v / dv_m[None, :], 0.0)
    b_p_v = jnp.where(pos, 0.0, -adv_v / dv_p[None, :])
    b_c_v = -b_m_v - b_p_v

    ones_i = jnp.ones((nS - 2, 1))
    diag_v = jnp.ones((nS - 2, nv)).at[:, 1:-1].add(
        -dtt * (a_c_v + b_c_v - r) * ones_i)
    lower_v = jnp.zeros((nS - 2, nv - 1)).at[:, :-1].set(
        -dtt * (a_m_v + b_m_v) * ones_i)
    upper_v = jnp.zeros((nS - 2, nv - 1)).at[:, 1:].set(
        -dtt * (a_p_v + b_p_v) * ones_i)

    def apply_A2(V):
        """apply_v_operator (:419-441): CENTRAL advection + -rV (deliberate
        mismatch with the upwinded implicit matrix, see module docstring)."""
        Vc = V[1:-1, 1:-1]
        V_vv = ((V[1:-1, 2:] - Vc) / dv_p[None, :]
                - (Vc - V[1:-1, :-2]) / dv_m[None, :]) / dv_avg[None, :]
        V_v = (V[1:-1, 2:] - V[1:-1, :-2]) / (dv_m + dv_p)[None, :]
        out = diff_v * V_vv + adv_v * V_v - r * Vc
        return jnp.zeros_like(V).at[1:-1, 1:-1].set(out)

    from ..ops.tridiag import thomas

    def adi_step(V):
        F0 = full_operator(V)
        Y0 = V + dt * F0
        # implicit S-sweep per interior j (heston_pde.hpp:217-228)
        rhs1 = (Y0 - dtt * apply_A1(V))[:, 1:-1].T      # (nv-2, nS)
        Y1 = Y0.at[:, 1:-1].set(thomas(lower_S, diag_S, upper_S, rhs1).T)
        # implicit v-sweep per interior i (:231-242)
        rhs2 = (Y1 - dtt * apply_A2(V))[1:-1, :]        # (nS-2, nv)
        Y2 = Y1.at[1:-1, :].set(thomas(lower_v, diag_v, upper_v, rhs2))
        # correction step (:245-248) multiplies by (0.5 - theta_adi) == 0
        return Y2

    def apply_bc(V, t_cal):
        df = jnp.exp(-r * t_cal)
        if is_call:
            V = V.at[0, :].set(0.0)
            V = V.at[-1, :].set(S[-1] - K * df)
        else:
            V = V.at[0, :].set(K * df - S[0])
            V = V.at[-1, :].set(0.0)
        V = V.at[:, 0].set(2.0 * V[:, 1] - V[:, 2])
        V = V.at[:, -1].set(2.0 * V[:, -2] - V[:, -3])
        return V

    def step(V, t_cal):
        V = adi_step(V)
        if american:
            V = jnp.maximum(V, payoff)
        V = apply_bc(V, t_cal)
        return V, None

    t_cals = dt * jnp.arange(n_time - 1, -1, -1, dtype=f64)
    V, _ = jax.lax.scan(step, payoff.astype(f64), t_cals)

    # ---- nearest-index clamped bilinear readout (:481-505) ----
    i_n = jnp.clip(_nearest_index(S, S0), 1, nS - 2)
    j_n = jnp.clip(_nearest_index(v, v0), 1, nv - 2)
    t_S = jnp.clip((S0 - S[i_n - 1]) / (S[i_n] - S[i_n - 1]), 0.0, 1.0)
    t_v = jnp.clip((v0 - v[j_n - 1]) / (v[j_n] - v[j_n - 1]), 0.0, 1.0)
    price = ((1 - t_S) * (1 - t_v) * V[i_n - 1, j_n - 1]
             + t_S * (1 - t_v) * V[i_n, j_n - 1]
             + (1 - t_S) * t_v * V[i_n - 1, j_n]
             + t_S * t_v * V[i_n, j_n])

    # ---- Greeks at the nearest indices (:507-559) ----
    jg = _nearest_index(v, v0)
    ig = jnp.clip(_nearest_index(S, S0), 1, nS - 2)
    delta = (V[ig + 1, jg] - V[ig - 1, jg]) / (S[ig + 1] - S[ig - 1])
    dSm = S[ig] - S[ig - 1]
    dSp = S[ig + 1] - S[ig]
    dSa = 0.5 * (dSm + dSp)
    gamma = (V[ig + 1, jg] - 2 * V[ig, jg] + V[ig - 1, jg]) / (dSa * dSa)
    jv = jnp.clip(jg, 1, nv - 2)
    dV_dv = (V[ig, jv + 1] - V[ig, jv - 1]) / (v[jv + 1] - v[jv - 1])
    vega = 2.0 * jnp.sqrt(v0) * T * dV_dv
    theta_greek = -full_operator(V)[ig, jg]

    return HestonPDEResult(
        price=price, delta=delta, gamma=gamma, vega=vega, theta=theta_greek,
        prices=V, spot_grid=S, vol_grid=v,
    )


def solve_reference(params: HestonPDEParams, S0) -> HestonPDEResult:
    """Solve with the reference's exact scheme (defects included).

    Parity oracle against tests/golden/reference_pde_values.json; see module
    docstring for the catalogue of replicated reference behaviours.  The
    ``scheme`` / ``american_method`` fields of ``params`` are ignored (the
    reference has one scheme and projection-only American handling).
    """
    return _solve_ref(
        params.kappa, params.theta, params.sigma, params.rho, params.v0,
        params.r, params.q, params.T, params.K, S0,
        params.s_min_mult, params.s_max_mult, params.v_max,
        int(params.n_spot), int(params.n_vol), int(params.n_time),
        bool(params.is_call), bool(params.american),
    )
