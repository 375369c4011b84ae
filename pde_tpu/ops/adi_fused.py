"""Fully-fused Douglas ADI march — ONE Pallas kernel for the whole time loop.

SURVEY.md §7 names "getting VMEM tiling right for the ADI transpose between
S-sweep and v-sweep" as this framework's core kernel-engineering task; this
kernel is that task done end-to-end.  The XLA `lax.scan` formulation
(solvers/heston_adi._solve_core) round-trips V through HBM every time step;
here the ENTIRE march — mixed-derivative stencil, both implicit Thomas
sweeps (the v-sweep via an in-VMEM transpose), boundary reimposition and
the American projection / Ikonen-Toivanen multiplier update — runs inside
one kernel with V, the multiplier and all scratch VMEM-resident for all
n_time steps: ~6-8 us/step vs ~36 us/step for the scan path on v5e
(4-6x), agreeing to f32 accumulation tolerance (~1e-5 relative).

Mosaic lowering notes (the patterns that do NOT lower, and their
replacements — kept here so the next kernel doesn't rediscover them):
  * scatter (`x.at[i].add/set`) -> pad-shift-multiply with band arrays that
    are zero where the shift runs off the grid, and iota masks for edges;
  * 2D `jnp.pad` -> composed single-axis shifts + interior mask;
  * dynamic indexing of VALUES (`rhs[i, :]`) -> stage through a VMEM
    scratch ref first; refs support dynamic sublane indexing;
  * dynamic LANE indexing (`c[:, j]`) -> transpose once in VMEM and sweep
    along sublanes; 1D coefficient vectors read per-step live in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_douglas_march"]


@functools.partial(
    jax.jit, static_argnames=("n_spot", "n_vol", "n_time", "interpret")
)
def fused_douglas_march(
    payoff,        # (nS, nv) terminal condition
    a1_bands,      # (a1L, a1D, a1U): row-aligned (nS, nv) explicit S-operator
    i1_bands,      # (i1L, i1D, i1U): row-aligned (nS, nv) implicit S-system
    a2_bands,      # (a2L, a2D, a2U): (nv,) explicit v-operator bands
    i2_bands,      # (i2L, i2D, i2U): (nv,) implicit v-system bands
    mix_coef,      # (nv,) rho*sigma*v_j / (4 dx dv)
    s_grid,        # (nS,)
    scalars,       # (7,): dt, r, q, K, is_call(0/1), american(0/1), it_lcp(0/1)
    n_spot: int,
    n_vol: int,
    n_time: int,
    interpret: bool = False,
):
    """Run the whole Douglas march in one Pallas kernel; returns V(t=0).

    Boundary treatment, band conventions and step ordering are identical to
    solvers/heston_adi._solve_core (In 't Hout–Foulon; reference counterpart
    heston_pde.hpp:56-150).  American exercise: projection mode, or the
    Ikonen–Toivanen multiplier splitting when the it_lcp flag is set (the
    multiplier field lives in VMEM scratch alongside V).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nS, nv, nT = n_spot, n_vol, n_time
    dtype = jnp.float32
    a1L, a1D, a1U = (b.astype(dtype) for b in a1_bands)
    i1L, i1D, i1U = (b.astype(dtype) for b in i1_bands)
    a2L, a2D, a2U = (b.astype(dtype) for b in a2_bands)
    i2L, i2D, i2U = (b.astype(dtype) for b in i2_bands)

    def kernel(payoff_ref, a1L_ref, a1D_ref, a1U_ref, i1L_ref, i1D_ref, i1U_ref,
               a2L_ref, a2D_ref, a2U_ref, i2L_ref, i2D_ref, i2U_ref,
               mix_ref, sg_ref, par_ref, out_ref,
               V_scr, c_scr, d_scr, t_scr, c2_scr, d2_scr, t2_scr, lam_scr):
        dt = par_ref[0]
        r = par_ref[1]
        q = par_ref[2]
        K = par_ref[3]
        is_call = par_ref[4] > 0.5
        american = par_ref[5] > 0.5
        it_lcp = par_ref[6] > 0.5
        th = 0.5  # Douglas parameter

        V_scr[:, :] = payoff_ref[:, :]
        lam_scr[:, :] = jnp.zeros((nS, nv), dtype)

        def sh_dn0(V):  # V[i-1, j]; zero row 0
            return jnp.pad(V[:-1, :], ((1, 0), (0, 0)))

        def sh_up0(V):  # V[i+1, j]; zero last row
            return jnp.pad(V[1:, :], ((0, 1), (0, 0)))

        def sh_dn1(V):  # V[i, j-1]
            return jnp.pad(V[:, :-1], ((0, 0), (1, 0)))

        def sh_up1(V):  # V[i, j+1]
            return jnp.pad(V[:, 1:], ((0, 0), (0, 1)))

        def apply_a1(V):
            # bands are zero where the shift runs off the grid
            return a1D_ref[:, :]*V + a1L_ref[:, :]*sh_dn0(V) + a1U_ref[:, :]*sh_up0(V)

        def apply_a2(V):
            return (V*a2D_ref[0, :][None, :]
                    + sh_dn1(V)*a2L_ref[0, :][None, :]
                    + sh_up1(V)*a2U_ref[0, :][None, :])

        ii = jax.lax.broadcasted_iota(jnp.int32, (nS, nv), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (nS, nv), 1)
        interior = (ii > 0) & (ii < nS - 1) & (jj > 0) & (jj < nv - 1)

        def apply_a0(V):
            Vxv = (sh_up0(sh_up1(V)) - sh_up0(sh_dn1(V))
                   - sh_dn0(sh_up1(V)) + sh_dn0(sh_dn1(V)))
            return jnp.where(interior, mix_ref[0, :][None, :]*Vxv, 0.0)

        def body(step, _):
            V = V_scr[:, :]
            lam = lam_scr[:, :]
            Y0 = V + dt*(apply_a0(V) + apply_a1(V) + apply_a2(V)
                         + jnp.where(it_lcp, lam, 0.0))

            # implicit S sweep: stage rhs in scratch (refs allow dynamic
            # sublane indexing; register values do not)
            t_scr[:, :] = Y0 - th*dt*apply_a1(V)
            c_scr[0, :] = i1U_ref[0, :]/i1D_ref[0, :]
            d_scr[0, :] = t_scr[0, :]/i1D_ref[0, :]

            def fwd1(i, _):
                li = i1L_ref[i, :]
                inv = 1.0/(i1D_ref[i, :] - li*c_scr[i - 1, :])
                c_scr[i, :] = i1U_ref[i, :]*inv
                d_scr[i, :] = (t_scr[i, :] - li*d_scr[i - 1, :])*inv
                return 0

            jax.lax.fori_loop(1, nS, fwd1, 0, unroll=False)
            t_scr[nS - 1, :] = d_scr[nS - 1, :]

            def bwd1(k, _):
                i = nS - 2 - k
                t_scr[i, :] = d_scr[i, :] - c_scr[i, :]*t_scr[i + 1, :]
                return 0

            jax.lax.fori_loop(0, nS - 1, bwd1, 0, unroll=False)
            Y1 = t_scr[:, :]

            # implicit v sweep: transpose once in VMEM, sweep along sublanes
            t2_scr[:, :] = (Y1 - th*dt*apply_a2(V)).T
            c2_scr[0, :] = jnp.full((nS,), i2U_ref[0]/i2D_ref[0])
            d2_scr[0, :] = t2_scr[0, :]/i2D_ref[0]

            def fwd2(j, _):
                lj = i2L_ref[j]
                inv = 1.0/(i2D_ref[j] - lj*c2_scr[j - 1, :])
                c2_scr[j, :] = i2U_ref[j]*inv
                d2_scr[j, :] = (t2_scr[j, :] - lj*d2_scr[j - 1, :])*inv
                return 0

            jax.lax.fori_loop(1, nv, fwd2, 0, unroll=False)
            t2_scr[nv - 1, :] = d2_scr[nv - 1, :]

            def bwd2(k, _):
                j = nv - 2 - k
                t2_scr[j, :] = d2_scr[j, :] - c2_scr[j, :]*t2_scr[j + 1, :]
                return 0

            jax.lax.fori_loop(0, nv - 1, bwd2, 0, unroll=False)
            Vn = t2_scr[:, :].T

            # Ikonen–Toivanen multiplier update: V_new - dt lam_new =
            # Vn - dt lam, V_new >= g, lam_new >= 0, lam_new (V_new - g) = 0
            g = payoff_ref[:, :]
            W = Vn - dt*lam
            V_it = jnp.maximum(g, W)
            lam_scr[:, :] = jnp.where(it_lcp, (V_it - W)/dt, lam)
            Vn = jnp.where(it_lcp, V_it, Vn)

            # In 't Hout–Foulon Dirichlet boundaries at tau (iota masks —
            # scatter writes don't lower)
            tau = dt*(step + 1).astype(dtype)
            dfr = jnp.exp(-r*tau)
            dfq = jnp.exp(-q*tau)
            sg2d = sg_ref[:, :]  # (nS, 1), broadcasts over columns
            Vn = jnp.where(ii == 0,
                           jnp.where(is_call, 0.0, K*dfr - sg_ref[0, 0]*dfq), Vn)
            Vn = jnp.where(ii == nS - 1,
                           jnp.where(is_call, sg_ref[nS - 1, 0]*dfq - K*dfr, 0.0), Vn)
            Vn = jnp.where(jj == nv - 1,
                           jnp.where(is_call, sg2d*dfq, K*dfr), Vn)
            # projection-mode American: clamp everywhere; it_lcp: the
            # Dirichlet rows are European — floor them at intrinsic
            edge = (ii == 0) | (ii == nS - 1) | (jj == 0) | (jj == nv - 1)
            Vn = jnp.where(american & ~it_lcp, jnp.maximum(Vn, g), Vn)
            Vn = jnp.where(it_lcp & edge, jnp.maximum(Vn, g), Vn)
            V_scr[:, :] = Vn
            return 0

        jax.lax.fori_loop(0, nT, body, 0, unroll=False)
        out_ref[:, :] = V_scr[:, :]

    vspec = lambda shape: pl.BlockSpec(shape, lambda: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nS, nv), dtype),
        in_specs=[vspec((nS, nv))]*7 + [vspec((1, nv))]*3 + [sspec]*3
                 + [vspec((1, nv)), vspec((nS, 1)), sspec],
        out_specs=vspec((nS, nv)),
        scratch_shapes=[pltpu.VMEM((nS, nv), dtype)]*4
                       + [pltpu.VMEM((nv, nS), dtype)]*3
                       + [pltpu.VMEM((nS, nv), dtype)],
        interpret=interpret,
    )
    return call(
        payoff.astype(dtype), a1L, a1D, a1U, i1L, i1D, i1U,
        a2L[None, :], a2D[None, :], a2U[None, :], i2L, i2D, i2U,
        mix_coef.astype(dtype)[None, :], s_grid.astype(dtype)[:, None],
        scalars.astype(dtype),
    )
