"""Fully-fused 1D Crank-Nicolson march — a whole option BOOK in ONE kernel.

The 1D analog of ops/adi_fused.fused_douglas_march_batched: the reference
prices Black-Scholes PDE books by looping one C++ solve per option
(black_scholes_pde.hpp:97-147 called per option), and the XLA ``lax.scan``
path (solvers/bs_pde._solve_impl under ``vmap``) round-trips V through HBM
every time step.  Here the ENTIRE backward march for B options — explicit
CN half-step, factored implicit Thomas sweep, Dirichlet boundary
reimposition and the American projection — runs inside one Pallas kernel
with everything VMEM-resident, the option batch riding the 128 VPU lanes.

Layout is ``(n_space sublane, B lane)``: the Thomas recurrence walks the
sublane dim in ``(1, B)`` row ops; every vector op carries all B options.
In log-spot coordinates with K-scaled grids, dx is the SAME for every
option, so the constant-coefficient operator is three scalars per lane —
no band arrays at all.  A batch may mix strikes, maturities, rates, vols,
calls with puts, AND European with American (projection, per-lane flag).

Mosaic lowering notes inherited from adi_fused.py: no scatter, stage
dynamically-indexed values through VMEM refs, masks as tiny f32 inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_cn_march_1d"]


@functools.partial(
    jax.jit, static_argnames=("n_space", "n_time", "w", "interpret")
)
def fused_cn_march_1d(
    pay,          # (n, B) per-option payoff profile on its K-scaled grid
    sc,           # (12, B): dt, r, q, K, is_call(0/1), american(0/1),
                  #          L_m, L_c, L_p, s_min, s_max, 0
    n_space: int,
    n_time: int,
    w: float = 0.5,   # theta-scheme weight: CN = 1/2, implicit Euler = 1
    interpret: bool = False,
):
    """March the whole book backward n_time steps; returns V(t=0) as (n, B).

    Boundary treatment and step ordering match solvers/bs_pde._solve_impl
    (non-compat path): implicit solve -> Dirichlet overwrite at tau ->
    American floor (so boundary rows are floored at intrinsic too).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = n_space
    B = pay.shape[-1]
    BLK = 128 if B % 128 == 0 else B  # full-lane blocks; tiny batches in one
    nb = B // BLK
    dtype = jnp.float32

    # row masks as tiny f32 inputs ((n, 1)) — avoids in-kernel iota
    ar = jnp.arange(n, dtype=dtype)[:, None]
    m0 = (ar == 0).astype(dtype)
    mN = (ar == n - 1).astype(dtype)
    mi = ((ar > 0) & (ar < n - 1)).astype(dtype)

    def kernel(pay_ref, sc_ref, m0_ref, mN_ref, mi_ref, out_ref,
               V_scr, c_scr, inv_scr, d_scr):
        dt = sc_ref[0:1, :]        # (1, B)
        r = sc_ref[1:2, :]
        q = sc_ref[2:3, :]
        K = sc_ref[3:4, :]
        call_f = sc_ref[4:5, :]
        amer_f = sc_ref[5:6, :]
        Lm = sc_ref[6:7, :]
        Lc = sc_ref[7:8, :]
        Lp = sc_ref[8:9, :]
        s_lo = sc_ref[9:10, :]
        s_hi = sc_ref[10:11, :]

        m0_ = m0_ref[:, :]
        mN_ = mN_ref[:, :]
        mi_ = mi_ref[:, :]
        g = pay_ref[:, :]

        # implicit bands (constant-coefficient: scalars per lane; boundary
        # rows are identity)
        li = -(w * dt) * Lm        # (1, B), valid on interior rows
        di = 1.0 - (w * dt) * Lc
        ui = -(w * dt) * Lp

        # Thomas-factorize ONCE (time-independent operator): row 0 identity
        c_scr[0:1, :] = jnp.zeros((1, BLK), dtype)
        inv_scr[0:1, :] = jnp.ones((1, BLK), dtype)

        def fac(i, _):
            nl = (i < n - 1).astype(dtype)  # 0 at the last (identity) row
            l_i = li * nl
            d_i = di * nl + (1.0 - nl)
            u_i = ui * nl
            inv = 1.0 / (d_i - l_i * c_scr[pl.ds(i - 1, 1), :])
            c_scr[pl.ds(i, 1), :] = u_i * inv
            inv_scr[pl.ds(i, 1), :] = inv
            return 0

        jax.lax.fori_loop(1, n, fac, 0, unroll=False)

        V_scr[:, :] = g

        def sh_dn(V):  # V[i-1]; zero row 0
            return jnp.pad(V[:-1, :], ((1, 0), (0, 0)))

        def sh_up(V):  # V[i+1]; zero last row
            return jnp.pad(V[1:, :], ((0, 1), (0, 0)))

        def body(step, _):
            V = V_scr[:, :]
            # explicit CN half-step on interior rows (w = 1 skips via factor)
            LV = Lm * sh_dn(V) + Lc * V + Lp * sh_up(V)
            out_ref[:, :] = V + ((1.0 - w) * dt) * (mi_ * LV)

            # factored implicit sweep: rhs staged in out_ref, d in scratch
            d_scr[0:1, :] = out_ref[0:1, :]

            def fwd(i, _):
                nl = (i < n - 1).astype(dtype)
                l_i = li * nl
                d_scr[pl.ds(i, 1), :] = (
                    out_ref[pl.ds(i, 1), :]
                    - l_i * d_scr[pl.ds(i - 1, 1), :]
                ) * inv_scr[pl.ds(i, 1), :]
                return 0

            jax.lax.fori_loop(1, n, fwd, 0, unroll=False)
            out_ref[pl.ds(n - 1, 1), :] = d_scr[pl.ds(n - 1, 1), :]

            def bwd(k, _):
                i = n - 2 - k
                out_ref[pl.ds(i, 1), :] = (
                    d_scr[pl.ds(i, 1), :]
                    - c_scr[pl.ds(i, 1), :] * out_ref[pl.ds(i + 1, 1), :]
                )
                return 0

            jax.lax.fori_loop(0, n - 1, bwd, 0, unroll=False)
            Vn = out_ref[:, :]

            # Dirichlet boundaries at tau = (step+1) dt, then the American
            # floor (boundary rows floored at intrinsic too — bs_pde step
            # ordering, non-compat path)
            tau = dt * (step + 1).astype(dtype)
            dfr = jnp.exp(-r * tau)
            dfq = jnp.exp(-q * tau)
            bc0 = (1.0 - call_f) * (K * dfr - s_lo * dfq)
            bcN = call_f * (s_hi * dfq - K * dfr)
            Vn = Vn * (1.0 - m0_) + bc0 * m0_
            Vn = Vn * (1.0 - mN_) + bcN * mN_
            Vn = Vn + amer_f * (jnp.maximum(Vn, g) - Vn)
            V_scr[:, :] = Vn
            return 0

        jax.lax.fori_loop(0, n_time, body, 0, unroll=False)
        out_ref[:, :] = V_scr[:, :]

    lane = lambda rows: pl.BlockSpec(
        (rows, BLK), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec((n, 1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((n, B), dtype),
        in_specs=[lane(n), lane(12), full, full, full],
        out_specs=lane(n),
        scratch_shapes=[pltpu.VMEM((n, BLK), dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return out(pay.astype(dtype), sc.astype(dtype), m0, mN, mi)
