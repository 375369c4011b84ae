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

__all__ = ["fused_douglas_march", "fused_douglas_march_batched"]


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
               V_scr, c_scr, d_scr, t_scr, c2_scr, d2_scr, t2_scr, lam_scr,
               inv1_scr, inv2_scr):
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

        # both implicit operators are time-independent: Thomas-factorize
        # ONCE before the march (c and reciprocal pivots), so the per-step
        # serial chains below are multiply/fma-only
        c_scr[0, :] = i1U_ref[0, :]/i1D_ref[0, :]
        inv1_scr[0, :] = 1.0/i1D_ref[0, :]

        def fac1(i, _):
            li = i1L_ref[i, :]
            inv = 1.0/(i1D_ref[i, :] - li*c_scr[i - 1, :])
            c_scr[i, :] = i1U_ref[i, :]*inv
            inv1_scr[i, :] = inv
            return 0

        jax.lax.fori_loop(1, nS, fac1, 0, unroll=True)

        c2_scr[0, :] = jnp.full((nS,), i2U_ref[0]/i2D_ref[0])
        inv2_scr[0, :] = jnp.full((nS,), 1.0/i2D_ref[0])

        def fac2(j, _):
            lj = i2L_ref[j]
            inv = 1.0/(i2D_ref[j] - lj*c2_scr[j - 1, :])
            c2_scr[j, :] = i2U_ref[j]*inv
            inv2_scr[j, :] = inv
            return 0

        jax.lax.fori_loop(1, nv, fac2, 0, unroll=True)

        def body(step, _):
            V = V_scr[:, :]
            lam = lam_scr[:, :]
            Y0 = V + dt*(apply_a0(V) + apply_a1(V) + apply_a2(V)
                         + jnp.where(it_lcp, lam, 0.0))

            # implicit S sweep: stage rhs in scratch (refs allow dynamic
            # sublane indexing; register values do not)
            t_scr[:, :] = Y0 - th*dt*apply_a1(V)
            d_scr[0, :] = t_scr[0, :]*inv1_scr[0, :]

            def fwd1(i, _):
                li = i1L_ref[i, :]
                d_scr[i, :] = (t_scr[i, :] - li*d_scr[i - 1, :])*inv1_scr[i, :]
                return 0

            jax.lax.fori_loop(1, nS, fwd1, 0, unroll=True)
            t_scr[nS - 1, :] = d_scr[nS - 1, :]

            def bwd1(k, _):
                i = nS - 2 - k
                t_scr[i, :] = d_scr[i, :] - c_scr[i, :]*t_scr[i + 1, :]
                return 0

            jax.lax.fori_loop(0, nS - 1, bwd1, 0, unroll=True)
            Y1 = t_scr[:, :]

            # implicit v sweep: transpose once in VMEM, sweep along sublanes
            t2_scr[:, :] = (Y1 - th*dt*apply_a2(V)).T
            d2_scr[0, :] = t2_scr[0, :]*inv2_scr[0, :]

            def fwd2(j, _):
                lj = i2L_ref[j]
                d2_scr[j, :] = (t2_scr[j, :] - lj*d2_scr[j - 1, :])*inv2_scr[j, :]
                return 0

            jax.lax.fori_loop(1, nv, fwd2, 0, unroll=True)
            t2_scr[nv - 1, :] = d2_scr[nv - 1, :]

            def bwd2(k, _):
                j = nv - 2 - k
                t2_scr[j, :] = d2_scr[j, :] - c2_scr[j, :]*t2_scr[j + 1, :]
                return 0

            jax.lax.fori_loop(0, nv - 1, bwd2, 0, unroll=True)
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
                       + [pltpu.VMEM((nS, nv), dtype)]
                       + [pltpu.VMEM((nS, nv), dtype),
                          pltpu.VMEM((nv, nS), dtype)],
        interpret=interpret,
    )
    return call(
        payoff.astype(dtype), a1L, a1D, a1U, i1L, i1D, i1U,
        a2L[None, :], a2D[None, :], a2U[None, :], i2L, i2D, i2U,
        mix_coef.astype(dtype)[None, :], s_grid.astype(dtype)[:, None],
        scalars.astype(dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_spot", "n_vol", "n_time", "use_it", "interpret",
                     "unroll", "pcr_v", "pcr_s"),
)
def fused_douglas_march_batched(
    pay,           # (nS, 1, B) per-option payoff profile on its own K-scaled grid
    sg,            # (nS, 1, B) per-option spot grid K_b * exp(x_i)
    a1b,           # (3, nv, B) explicit S-operator interior rows [lo, di, up]
    i1b,           # (3, nv, B) implicit S-system interior rows [lo, di, up]
    a2b,           # (3, nv, B) explicit v-operator bands, row-aligned, edges baked
    i2b,           # (3, nv, B) implicit v-system bands, row-aligned (identity at j=nv-1)
    mixb,          # (1, nv, B) mixed-derivative coefficient, zero at both j edges
    sc,            # (8, 1, B): dt, r, q, K, is_call(0/1), american(0/1), 0, 0
    n_spot: int,
    n_vol: int,
    n_time: int,
    use_it: bool = False,
    interpret: bool = False,
    unroll=True,
    pcr_v: bool = False,
    pcr_s: bool = False,
):
    """Douglas ADI march for a whole option BATCH inside one Pallas kernel,
    the batch riding the 128 VPU lanes.

    Layout is ``(nS outer, nv sublane, B lane)`` throughout: the S-sweep's
    Thomas recurrence walks the *outer* dim (cheap ``(1, nv, B)`` slices),
    the v-sweep walks the sublane dim, and every vector op carries all B
    options at once — so, unlike :func:`fused_douglas_march`, no lanes idle
    (a single 100x50 grid uses 50 of 128 lanes) and the v-sweep needs no
    transpose.  In log-spot coordinates with K-scaled grids, dx is the SAME
    for every option, so the S-operator coefficients depend only on (v_j,
    option) — the bands enter as ``(nv, B)`` lane-stacks, not full grids.
    Per-option contract scalars (dt, r, q, K, call/put, American flag) ride
    ``(1, 1, B)`` lane vectors: a batch may mix strikes, maturities, rates,
    Heston parameters, calls with puts, AND European with American
    (projection).  The Ikonen-Toivanen LCP variant (``use_it=True``, static
    because it allocates the multiplier buffer) treats flagged lanes with
    the multiplier splitting.

    Batches larger than 128 run as a Mosaic grid over 128-lane blocks
    (caller pads).  VMEM: 4 grid-size buffers (5 with ``use_it``) of
    ~2.9 MB at the default 100x50 grid — the raised ``vmem_limit_bytes``
    covers it (the default 16 MB Mosaic cap was the old blocker; the chip
    has far more).

    Reference counterpart: the per-option C++ solver loop around
    heston_pde.hpp:116-170; here the whole desk marches per kernel call.
    """
    import math

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nS, nv, nT = n_spot, n_vol, n_time
    B = pay.shape[-1]
    BLK = 128 if B % 128 == 0 else B  # full-lane blocks; tiny batches in one
    nb = B // BLK
    dtype = jnp.float32
    th = 0.5  # Douglas parameter
    # PCR levels (strides 1, 2, 4, ... until >= the sweep length);
    # Mosaic fori_loop supports only unroll=1 or FULL unroll (True)
    n_lev = max(1, math.ceil(math.log2(nv)))
    n_lev_s = max(1, math.ceil(math.log2(nS)))

    # i-axis masks as tiny inputs ((nS, 1, 1) f32) — avoids 3D iota in-kernel
    ar = jnp.arange(nS, dtype=dtype)[:, None, None]
    m0 = (ar == 0).astype(dtype)
    mN = (ar == nS - 1).astype(dtype)
    mi = ((ar > 0) & (ar < nS - 1)).astype(dtype)
    aj = jnp.arange(nv, dtype=dtype)[None, :, None]
    mj0 = (aj == 0).astype(dtype)
    mjN = (aj == nv - 1).astype(dtype)
    jidx = aj  # (1, nv, 1) j indices: builds PCR pad-region masks in-kernel

    def kernel(pay_ref, sg_ref, a1_ref, i1_ref, a2_ref, i2_ref, mix_ref,
               sc_ref, m0_ref, mN_ref, mi_ref, mj0_ref, mjN_ref, jidx_ref,
               iidx_ref, out_ref, *scratch):
        if use_it:
            *rest, lam_scr = scratch
        else:
            rest = scratch
        if pcr_s:
            *rest, sab_scr, sinvd_scr = rest
        # slot 5/6: (c2, inv2) Thomas factors, or (alpha/beta stack, 1/d)
        # PCR level coefficients — same positions, mode-dependent meaning
        V_scr, d_scr, c1_scr, inv1_scr, s2a_scr, s2b_scr = rest
        dt = sc_ref[0:1, :, :]      # (1, 1, B)
        r = sc_ref[1:2, :, :]
        q = sc_ref[2:3, :, :]
        K = sc_ref[3:4, :, :]
        call_f = sc_ref[4:5, :, :]
        amer_f = sc_ref[5:6, :, :]

        m0_ = m0_ref[:, :, :]
        mN_ = mN_ref[:, :, :]
        mi_ = mi_ref[:, :, :]
        mj0_ = mj0_ref[:, :, :]
        mjN_ = mjN_ref[:, :, :]

        g = pay_ref[:, :, :]        # (nS, 1, B), broadcasts over sublanes

        V_scr[:, :, :] = jnp.broadcast_to(g, (nS, nv, BLK))
        if use_it:
            lam_scr[:, :, :] = jnp.zeros((nS, nv, BLK), dtype)

        def sh_dn0(V):  # V[i-1, j]; zero row 0
            return jnp.pad(V[:-1], ((1, 0), (0, 0), (0, 0)))

        def sh_up0(V):  # V[i+1, j]; zero last row
            return jnp.pad(V[1:], ((0, 1), (0, 0), (0, 0)))

        def sh_dn1(V):  # V[i, j-1]
            return jnp.pad(V[:, :-1], ((0, 0), (1, 0), (0, 0)))

        def sh_up1(V):  # V[i, j+1]
            return jnp.pad(V[:, 1:], ((0, 0), (0, 1), (0, 0)))

        a1L, a1D, a1U = a1_ref[0:1, :, :], a1_ref[1:2, :, :], a1_ref[2:3, :, :]
        i1L, i1D, i1U = i1_ref[0:1, :, :], i1_ref[1:2, :, :], i1_ref[2:3, :, :]
        a2L, a2D, a2U = a2_ref[0:1, :, :], a2_ref[1:2, :, :], a2_ref[2:3, :, :]
        mix = mix_ref[:, :, :]

        def apply_a1(V):
            return mi_ * (a1D * V + a1L * sh_dn0(V) + a1U * sh_up0(V))

        def apply_a2(V):
            return a2D * V + a2L * sh_dn1(V) + a2U * sh_up1(V)

        def apply_a0(V):
            Vxv = (sh_up0(sh_up1(V)) - sh_up0(sh_dn1(V))
                   - sh_dn0(sh_up1(V)) + sh_dn0(sh_dn1(V)))
            return mi_ * (mix * Vxv)

        # shifts along the sublane (j) / outer (i) axes with a static
        # stride, for PCR
        def sh_dn1s(x, s):  # x[:, j-s, :]; zero where j < s
            return jnp.pad(x[:, :-s, :], ((0, 0), (s, 0), (0, 0)))

        def sh_up1s(x, s):  # x[:, j+s, :]; zero where j >= nv-s
            return jnp.pad(x[:, s:, :], ((0, 0), (0, s), (0, 0)))

        def sh_dn0s(x, s):  # x[i-s, :, :]; zero where i < s
            return jnp.pad(x[:-s], ((s, 0), (0, 0), (0, 0)))

        def sh_up0s(x, s):  # x[i+s, :, :]; zero where i >= nS-s
            return jnp.pad(x[s:], ((0, s), (0, 0), (0, 0)))

        # both implicit operators are time-independent: factorize ONCE
        # before the march; the per-step chains are then mul/fma-only.
        if pcr_s:
            # S system via PCR on the outer axis: full (nS, nv, B) level
            # coefficients (boundary identity rows couple in, so unlike
            # the v bands they do not stay i-independent across levels)
            ii1 = iidx_ref[:, :, :]                      # (nS, 1, 1)
            ls = i1L * mi_
            ds = i1D * mi_ + (1.0 - mi_)
            us = i1U * mi_
            for lev in range(n_lev_s):
                s = 1 << lev
                in_lo = (ii1 >= s).astype(dtype)
                in_hi = (ii1 < nS - s).astype(dtype)
                d_dn = sh_dn0s(ds, s) + (1.0 - in_lo)
                d_up = sh_up0s(ds, s) + (1.0 - in_hi)
                alpha = -(ls * in_lo) / d_dn
                beta = -(us * in_hi) / d_up
                sab_scr[(2 * lev) * nS:(2 * lev + 1) * nS, :, :] = alpha
                sab_scr[(2 * lev + 1) * nS:(2 * lev + 2) * nS, :, :] = beta
                ls, us, ds = (
                    alpha * sh_dn0s(ls, s),
                    beta * sh_up0s(us, s),
                    ds + alpha * sh_dn0s(us, s) + beta * sh_up0s(ls, s),
                )
            sinvd_scr[:, :, :] = 1.0 / ds
        else:
            # S system Thomas factors: row 0 and nS-1 are identity
            # (c = 0, inv = 1)
            c1_scr[0:1, :, :] = jnp.zeros((1, nv, BLK), dtype)
            inv1_scr[0:1, :, :] = jnp.ones((1, nv, BLK), dtype)

            def fac1(i, _):
                nl = (i < nS - 1).astype(dtype)  # 0 at the last row
                li = i1L * nl
                dg = i1D * nl + (1.0 - nl)
                ui = i1U * nl
                inv = 1.0 / (dg - li * c1_scr[pl.ds(i - 1, 1), :, :])
                c1_scr[pl.ds(i, 1), :, :] = ui * inv
                inv1_scr[pl.ds(i, 1), :, :] = inv
                return 0

            jax.lax.fori_loop(1, nS, fac1, 0, unroll=unroll)

        if pcr_v:
            # v system via PARALLEL CYCLIC REDUCTION: the serial-in-j
            # Thomas sweep walks (nS, 1, B) slices — one sublane of eight
            # live per vector op — while PCR runs log2(nv) levels of
            # FULL-ARRAY shifted fmas.  The level coefficients
            # (alpha, beta) and the final diagonal depend only on the
            # bands, which are time-independent, so they precompute once
            # here; each march step then reduces the rhs with 2 fmas per
            # level and one multiply by 1/d.
            jj1 = jidx_ref[:, :, :]                      # (1, nv, 1)
            lv = i2_ref[0:1, :, :]
            dv = i2_ref[1:2, :, :]
            uv = i2_ref[2:3, :, :]
            for lev in range(n_lev):
                s = 1 << lev
                in_lo = (jj1 >= s).astype(dtype)         # j-s exists
                in_hi = (jj1 < nv - s).astype(dtype)     # j+s exists
                d_dn = sh_dn1s(dv, s) + (1.0 - in_lo)    # pad d with 1
                d_up = sh_up1s(dv, s) + (1.0 - in_hi)
                alpha = -(lv * in_lo) / d_dn
                beta = -(uv * in_hi) / d_up
                s2a_scr[2 * lev:2 * lev + 1, :, :] = alpha
                s2a_scr[2 * lev + 1:2 * lev + 2, :, :] = beta
                lv, uv, dv = (
                    alpha * sh_dn1s(lv, s),
                    beta * sh_up1s(uv, s),
                    dv + alpha * sh_dn1s(uv, s) + beta * sh_up1s(lv, s),
                )
            s2b_scr[:, :, :] = 1.0 / dv
        else:
            # v system Thomas factors: coefficients depend on (j, option)
            # only — (1, nv, B)
            s2a_scr[:, 0:1, :] = i2_ref[2:3, 0:1, :] / i2_ref[1:2, 0:1, :]
            s2b_scr[:, 0:1, :] = 1.0 / i2_ref[1:2, 0:1, :]

            def fac2(j, _):
                lj = i2_ref[0:1, pl.ds(j, 1), :]
                inv = 1.0 / (
                    i2_ref[1:2, pl.ds(j, 1), :]
                    - lj * s2a_scr[:, pl.ds(j - 1, 1), :]
                )
                s2a_scr[:, pl.ds(j, 1), :] = i2_ref[2:3, pl.ds(j, 1), :] * inv
                s2b_scr[:, pl.ds(j, 1), :] = inv
                return 0

            jax.lax.fori_loop(1, nv, fac2, 0, unroll=unroll)

        def body(step, _):
            V = V_scr[:, :, :]
            # rhs1 = V + dt A0 V + (1-th) dt A1 V + dt A2 V (+ dt lam)
            acc = V + dt * apply_a0(V)
            acc = acc + ((1.0 - th) * dt) * apply_a1(V)
            acc = acc + dt * apply_a2(V)
            if use_it:
                acc = acc + dt * lam_scr[:, :, :]
            out_ref[:, :, :] = acc

            if pcr_s:
                # S solve: log2(nS) full-array shifted-fma reductions
                rr = out_ref[:, :, :]
                for lev in range(n_lev_s):
                    s = 1 << lev
                    alpha = sab_scr[(2 * lev) * nS:(2 * lev + 1) * nS, :, :]
                    beta = sab_scr[(2 * lev + 1) * nS:(2 * lev + 2) * nS, :, :]
                    rr = (rr + alpha * sh_dn0s(rr, s)
                          + beta * sh_up0s(rr, s))
                out_ref[:, :, :] = rr * sinvd_scr[:, :, :]
            else:
                # implicit S sweep (Thomas along the outer dim; row 0
                # identity: inv = 1, li = 0 make d[0] = rhs[0])
                d_scr[0:1, :, :] = out_ref[0:1, :, :]

                def fwd1(i, _):
                    nl = (i < nS - 1).astype(dtype)
                    li = i1L * nl
                    d_scr[pl.ds(i, 1), :, :] = (
                        out_ref[pl.ds(i, 1), :, :]
                        - li * d_scr[pl.ds(i - 1, 1), :, :]
                    ) * inv1_scr[pl.ds(i, 1), :, :]
                    return 0

                jax.lax.fori_loop(1, nS, fwd1, 0, unroll=unroll)
                out_ref[pl.ds(nS - 1, 1), :, :] = d_scr[pl.ds(nS - 1, 1), :, :]

                def bwd1(k, _):
                    i = nS - 2 - k
                    out_ref[pl.ds(i, 1), :, :] = (
                        d_scr[pl.ds(i, 1), :, :]
                        - c1_scr[pl.ds(i, 1), :, :]
                        * out_ref[pl.ds(i + 1, 1), :, :]
                    )
                    return 0

                jax.lax.fori_loop(0, nS - 1, bwd1, 0, unroll=unroll)

            # rhs2 = Y1 - th dt A2 V
            out_ref[:, :, :] = out_ref[:, :, :] - (th * dt) * apply_a2(V)

            if pcr_v:
                # v solve: log2(nv) full-array shifted-fma reductions with
                # the precomputed level coefficients, then one multiply
                rr = out_ref[:, :, :]
                for lev in range(n_lev):
                    s = 1 << lev
                    alpha = s2a_scr[2 * lev:2 * lev + 1, :, :]
                    beta = s2a_scr[2 * lev + 1:2 * lev + 2, :, :]
                    rr = (rr + alpha * sh_dn1s(rr, s)
                          + beta * sh_up1s(rr, s))
                out_ref[:, :, :] = rr * s2b_scr[:, :, :]
            else:
                # implicit v sweep (Thomas along the sublane dim; the
                # j = nv-1 identity row and the j = 0 one-sided row are
                # baked into i2)
                d_scr[:, 0:1, :] = out_ref[:, 0:1, :] * s2b_scr[:, 0:1, :]

                def fwd2(j, _):
                    lj = i2_ref[0:1, pl.ds(j, 1), :]      # (1, 1, B)
                    d_scr[:, pl.ds(j, 1), :] = (
                        out_ref[:, pl.ds(j, 1), :]
                        - lj * d_scr[:, pl.ds(j - 1, 1), :]
                    ) * s2b_scr[:, pl.ds(j, 1), :]
                    return 0

                jax.lax.fori_loop(1, nv, fwd2, 0, unroll=unroll)
                out_ref[:, pl.ds(nv - 1, 1), :] = d_scr[:, pl.ds(nv - 1, 1), :]

                def bwd2(k, _):
                    j = nv - 2 - k
                    out_ref[:, pl.ds(j, 1), :] = (
                        d_scr[:, pl.ds(j, 1), :]
                        - s2a_scr[:, pl.ds(j, 1), :]
                        * out_ref[:, pl.ds(j + 1, 1), :]
                    )
                    return 0

                jax.lax.fori_loop(0, nv - 1, bwd2, 0, unroll=unroll)
            Vn = out_ref[:, :, :]

            if use_it:
                # Ikonen-Toivanen multiplier update on flagged lanes:
                # V_new - dt lam_new = Vn - dt lam, V_new >= g, lam_new >= 0
                lam = lam_scr[:, :, :]
                W = Vn - dt * lam
                V_it = jnp.maximum(g, W)
                lam_scr[:, :, :] = amer_f * ((V_it - W) / dt) \
                    + (1.0 - amer_f) * lam
                Vn = amer_f * V_it + (1.0 - amer_f) * Vn

            # In 't Hout-Foulon Dirichlet boundaries at tau (mask algebra —
            # neither scatter nor row-predicated writes lower)
            tau = dt * (step + 1).astype(dtype)
            dfr = jnp.exp(-r * tau)
            dfq = jnp.exp(-q * tau)
            sgv = sg_ref[:, :, :]                       # (nS, 1, B)
            bc0 = (1.0 - call_f) * (K * dfr - sg_ref[0:1, :, :] * dfq)
            bcN = call_f * (sg_ref[pl.ds(nS - 1, 1), :, :] * dfq - K * dfr)
            bcV = call_f * (sgv * dfq) + (1.0 - call_f) * (K * dfr)
            Vn = Vn * (1.0 - m0_) + bc0 * m0_
            Vn = Vn * (1.0 - mN_) + bcN * mN_
            Vn = Vn * (1.0 - mjN_) + bcV * mjN_

            if use_it:
                # Dirichlet edges are European; floor flagged lanes there
                me = jnp.minimum(m0_ + mN_ + mj0_ + mjN_, 1.0)
                w = me * amer_f
            else:
                w = amer_f  # projection mode: clamp flagged lanes everywhere
            Vn = Vn + w * (jnp.maximum(Vn, g) - Vn)
            V_scr[:, :, :] = Vn
            return 0

        jax.lax.fori_loop(0, nT, body, 0, unroll=False)
        out_ref[:, :, :] = V_scr[:, :, :]

    lane = lambda shape: pl.BlockSpec(
        shape[:-1] + (BLK,), lambda b: (0, 0, b), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    s2a_rows = 2 * n_lev if pcr_v else 1
    scratch = (
        [pltpu.VMEM((nS, nv, BLK), dtype)] * 4          # V, d, c1, inv1
        + [pltpu.VMEM((s2a_rows, nv, BLK), dtype),      # c2 | PCR alpha/beta
           pltpu.VMEM((1, nv, BLK), dtype)]             # inv2 | PCR 1/d
        + ([pltpu.VMEM((2 * n_lev_s * nS, nv, BLK), dtype),  # S-PCR a/b
            pltpu.VMEM((nS, nv, BLK), dtype)]                # S-PCR 1/d
           if pcr_s else [])
        + ([pltpu.VMEM((nS, nv, BLK), dtype)] if use_it else [])  # lam
    )
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nS, nv, B), dtype),
        in_specs=[lane((nS, 1, B))] * 2 + [lane((3, nv, B))] * 4
                 + [lane((1, nv, B)), lane((8, 1, B))]
                 + [full((nS, 1, 1))] * 3 + [full((1, nv, 1))] * 3
                 + [full((nS, 1, 1))],
        out_specs=lane((nS, nv, B)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    args = [a.astype(dtype) for a in (pay, sg, a1b, i1b, a2b, i2b, mixb, sc)]
    return call(*args, m0, mN, mi, mj0, mjN, jidx, ar)
