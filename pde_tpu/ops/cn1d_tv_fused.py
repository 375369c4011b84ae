"""Fused 1D Crank-Nicolson march with TIME-DEPENDENT coefficients.

Generalizes :mod:`pde_tpu.ops.cn1d_fused` (constant-coefficient whole-book
kernel) to operators that change every step — the local-volatility PDE,
where sigma(S, t) makes all three diagonals functions of the time level
(reference counterpart: the generalized per-step march of
black_scholes_pde.hpp:234-274, one C++ solve per option).

The XLA ``lax.scan`` formulation (solvers/local_vol_pde.solve) pays ~1 ms
per step on v5e: it re-evaluates the vol surface, rebuilds the diagonals
and round-trips V through HBM every step.  Here the per-step operator rows
are PRECOMPUTED for all time levels as one tensor op before the kernel
(the sigma(s, t) lattice is a fixed Dupire grid — evaluating it for all
(node, step) pairs at once is one interpolation call), and the whole march
runs fused.  Two variants, chosen by lattice size:

* **VMEM-resident** (default for production shapes): the entire
  ``(n_time+1, 3n, BLK)`` coefficient lattice for a 128-lane block sits in
  VMEM (31 MB at 200x100x128 — well under the ~100 MB budget) and the time
  loop is a ``fori_loop`` INSIDE one kernel invocation, reading each
  step's two band rows by dynamic index.  This matters enormously: making
  each time step its own Pallas GRID ITERATION (the original design) pays
  ~0.7 ms of per-iteration overhead — block window re-orchestration,
  prologue/epilogue — against ~20 us for an in-kernel loop step, a
  measured ~35x on the 256-option book (2.1k -> ~70k options/s).
* **HBM-streamed** (fallback for lattices beyond the VMEM budget): the
  original grid-over-time formulation — each grid step DMAs only that
  step's two coefficient rows, so arbitrarily long marches fit.

Unlike the constant-coefficient kernel the implicit operator changes every
step, so the Thomas factorization happens in-kernel per step (one extra
serial pass: 3n serial row ops per step instead of 2n).

Layout is ``(n_space sublane, B lane)`` as in cn1d_fused: the Thomas
recurrence walks sublanes in (1, B) row ops, every vector op carries all B
options.  Each option may carry its own dt/maturity (coefficient rows are
per-option), so a book may mix strikes, maturities, calls/puts and
European/American on one shared vol surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_cn_march_1d_tv"]

# lattice blocks up to this size keep all time levels VMEM-resident; the
# pallas_call vmem budget below is 100 MB, and scratch + payoff + code
# need headroom
_RESIDENT_LIMIT_BYTES = 64 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("n_space", "n_time", "w", "interpret")
)
def fused_cn_march_1d_tv(
    pay,          # (n, B) per-option payoff profile on its K-scaled grid
    bands,        # (n_time+1, 3n, B): [L_m; L_c; L_p] rows at time level k,
                  # where level k means calendar time T - k*dt (k=0 is
                  # expiry).  Step k uses level k (explicit side) and level
                  # k+1 (implicit side).
    sc,           # (8, B): dt, r, q, K, is_call(0/1), american(0/1),
                  #         s_min, s_max
    n_space: int,
    n_time: int,
    w: float = 0.5,   # theta-scheme weight: CN = 1/2, implicit Euler = 1
    interpret: bool = False,
):
    """March the whole book backward n_time steps; returns V(t=0) as (n, B).

    Boundary treatment and step ordering match solvers/local_vol_pde.solve:
    explicit half-step at the OLD time level, implicit solve at the NEW
    one, Dirichlet overwrite at tau (both discounts), American floor.
    """
    n = n_space
    B = pay.shape[-1]
    BLK = 128 if B % 128 == 0 else B  # full-lane blocks; tiny batches in one
    dtype = jnp.float32

    pay = pay.astype(dtype)
    bands = bands.astype(dtype)
    sc = sc.astype(dtype)

    resident_bytes = (n_time + 1) * 3 * n * BLK * 4
    if resident_bytes <= _RESIDENT_LIMIT_BYTES:
        return _march_resident(pay, bands, sc, n, n_time, BLK, w, dtype,
                               interpret)
    return _march_streamed(pay, bands, sc, n, n_time, BLK, w, dtype,
                           interpret)


def _row_masks(n, dtype):
    ar = jnp.arange(n, dtype=dtype)[:, None]
    m0 = (ar == 0).astype(dtype)
    mN = (ar == n - 1).astype(dtype)
    mi = ((ar > 0) & (ar < n - 1)).astype(dtype)
    return m0, mN, mi


def _step_math(pl, n, BLK, w, dtype, g, V, Lmo, Lco, Lpo, Lmn, Lcn, Lpn,
               sc_vals, tau, masks, out_ref, V_scr, c_scr, inv_scr, d_scr):
    """One CN step: explicit half-step, per-step Thomas factor+solve,
    Dirichlet boundaries, American floor.  Shared verbatim by both
    variants; returns the new V (also left in V_scr)."""
    dt, r, q, K, call_f, amer_f, s_lo, s_hi = sc_vals
    m0_, mN_, mi_ = masks

    def sh_dn(Vv):  # V[i-1]; zero row 0
        return jnp.pad(Vv[:-1, :], ((1, 0), (0, 0)))

    def sh_up(Vv):  # V[i+1]; zero last row
        return jnp.pad(Vv[1:, :], ((0, 1), (0, 0)))

    LV = Lmo * sh_dn(V) + Lco * V + Lpo * sh_up(V)
    rhs = V + ((1.0 - w) * dt) * (mi_ * LV)

    # implicit bands at the new level; boundary rows are identity.
    li = mi_ * (-(w * dt) * Lmn)
    di = mi_ * (1.0 - (w * dt) * Lcn) + (1.0 - mi_)
    ui = mi_ * (-(w * dt) * Lpn)

    # Thomas factorization + forward sweep FUSED (the operator changes
    # every step, so there is nothing to hoist).  Dynamically-indexed
    # values must live in refs (Mosaic: register values don't support
    # dynamic sublane reads), so stage all three bands: rhs in out_ref,
    # lower in inv_scr, upper (rescaled in place to c = u*piv) in c_scr,
    # and the diagonal in V_scr.  Row 0 is identity: c = 0, d = rhs[0].
    out_ref[:, :] = rhs
    inv_scr[:, :] = li
    c_scr[:, :] = ui
    V_scr[:, :] = di
    d_scr[0:1, :] = rhs[0:1, :]
    c_scr[0:1, :] = jnp.zeros((1, BLK), dtype)

    def fwd(i, _):
        l_i = inv_scr[pl.ds(i, 1), :]
        den = V_scr[pl.ds(i, 1), :] - l_i * c_scr[pl.ds(i - 1, 1), :]
        # pivot reciprocal WITHOUT a lane-wide divide: the implicit system
        # is an M-matrix (diagonal >= 1, off-diagonals <= 0), so pivots
        # stay positive and 1/x = rsqrt(x)^2 — rsqrt is a fast VPU op
        # while full-lane fdiv lowers ~30x slower inside this serial loop
        # (measured: the whole book march dropped 88 ms -> ~3 ms).
        # VALIDITY CONDITION: the M-matrix sign pattern requires the
        # discrete operator rows to be diffusion-dominated, i.e. with
        # a = 0.5 sigma^2/dx^2 and b = (r - q - 0.5 sigma^2)/(2 dx) the
        # off-diagonals a -+ b must stay >= 0: sigma^2 >= |r-q-sigma^2/2| dx.
        # Very low local vol with large |r-q| drift on a coarse grid can
        # flip an off-diagonal sign; the pivot then still stays positive
        # as long as w*dt*(|conv| - diff) < 0.5 per row (strict diagonal
        # dominance of the shifted system).  tests/test_local_vol.py
        # covers a low-vol/high-rate book against the scan route, which
        # uses a true divide and has no such restriction.
        rs = jax.lax.rsqrt(den)
        piv = rs * rs
        c_scr[pl.ds(i, 1), :] = c_scr[pl.ds(i, 1), :] * piv
        d_scr[pl.ds(i, 1), :] = (
            out_ref[pl.ds(i, 1), :]
            - l_i * d_scr[pl.ds(i - 1, 1), :]
        ) * piv
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

    # Dirichlet boundaries at tau (both discounts), then the American
    # floor — local_vol_pde.solve step ordering
    dfr = jnp.exp(-r * tau)
    dfq = jnp.exp(-q * tau)
    bc0 = (1.0 - call_f) * (K * dfr - s_lo * dfq)
    bcN = call_f * (s_hi * dfq - K * dfr)
    Vn = Vn * (1.0 - m0_) + bc0 * m0_
    Vn = Vn * (1.0 - mN_) + bcN * mN_
    Vn = Vn + amer_f * (jnp.maximum(Vn, g) - Vn)
    V_scr[:, :] = Vn
    return Vn


def _read_sc(sc_ref):
    return tuple(sc_ref[i:i + 1, :] for i in range(8))


def _march_resident(pay, bands, sc, n, n_time, BLK, w, dtype, interpret):
    """Whole lattice VMEM-resident, time loop inside ONE kernel invocation
    (per-block grid only) — no per-step grid overhead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = pay.shape[-1]
    nb = B // BLK
    m0, mN, mi = _row_masks(n, dtype)

    def kernel(pay_ref, bands_ref, sc_ref, m0_ref, mN_ref, mi_ref,
               out_ref, V_scr, c_scr, inv_scr, d_scr):
        sc_vals = _read_sc(sc_ref)
        dt = sc_vals[0]
        masks = (m0_ref[:, :], mN_ref[:, :], mi_ref[:, :])
        g = pay_ref[:, :]
        V_scr[:, :] = g

        def body(t, V):
            bo = bands_ref[pl.ds(t, 1), :, :]        # (1, 3n, BLK)
            bn = bands_ref[pl.ds(t + 1, 1), :, :]
            Lmo, Lco, Lpo = bo[0, 0:n, :], bo[0, n:2 * n, :], bo[0, 2 * n:, :]
            Lmn, Lcn, Lpn = bn[0, 0:n, :], bn[0, n:2 * n, :], bn[0, 2 * n:, :]
            tau = dt * (t + 1).astype(dtype)
            return _step_math(
                pl, n, BLK, w, dtype, g, V, Lmo, Lco, Lpo, Lmn, Lcn, Lpn,
                sc_vals, tau, masks, out_ref, V_scr, c_scr, inv_scr, d_scr)

        V = jax.lax.fori_loop(0, n_time, body, g, unroll=False)
        out_ref[:, :] = V

    lane = lambda rows: pl.BlockSpec(
        (rows, BLK), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    band_all = pl.BlockSpec(
        (n_time + 1, 3 * n, BLK), lambda b: (0, 0, b),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec((n, 1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((n, B), dtype),
        in_specs=[lane(n), band_all, lane(8), full, full, full],
        out_specs=lane(n),
        scratch_shapes=[pltpu.VMEM((n, BLK), dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )
    return out(pay, bands, sc, m0, mN, mi)


def _march_streamed(pay, bands, sc, n, n_time, BLK, w, dtype, interpret):
    """Grid-over-time fallback: each step DMAs only its two coefficient
    rows — for lattices beyond the VMEM budget.  ~0.7 ms/step of grid
    overhead; use only when resident does not fit."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = pay.shape[-1]
    nb = B // BLK
    m0, mN, mi = _row_masks(n, dtype)

    def kernel(pay_ref, bo_ref, bn_ref, sc_ref, m0_ref, mN_ref, mi_ref,
               out_ref, V_scr, c_scr, inv_scr, d_scr):
        t = pl.program_id(1)
        sc_vals = _read_sc(sc_ref)
        dt = sc_vals[0]
        masks = (m0_ref[:, :], mN_ref[:, :], mi_ref[:, :])
        g = pay_ref[:, :]

        @pl.when(t == 0)
        def _init():
            V_scr[:, :] = g

        bo = bo_ref[0, :, :]
        bn = bn_ref[0, :, :]
        Lmo, Lco, Lpo = bo[0:n, :], bo[n:2 * n, :], bo[2 * n:3 * n, :]
        Lmn, Lcn, Lpn = bn[0:n, :], bn[n:2 * n, :], bn[2 * n:3 * n, :]
        V = V_scr[:, :]
        tau = dt * (t + 1).astype(dtype)
        _step_math(
            pl, n, BLK, w, dtype, g, V, Lmo, Lco, Lpo, Lmn, Lcn, Lpn,
            sc_vals, tau, masks, out_ref, V_scr, c_scr, inv_scr, d_scr)

        @pl.when(t == n_time - 1)
        def _finish():
            out_ref[:, :] = V_scr[:, :]

    lane2 = lambda rows: pl.BlockSpec(
        (rows, BLK), lambda b, t: (0, b), memory_space=pltpu.VMEM
    )
    # the SAME bands array enters twice with shifted time index maps:
    # old level k (explicit side) and new level k+1 (implicit side)
    band_old = pl.BlockSpec(
        (1, 3 * n, BLK), lambda b, t: (t, 0, b), memory_space=pltpu.VMEM
    )
    band_new = pl.BlockSpec(
        (1, 3 * n, BLK), lambda b, t: (t + 1, 0, b), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec((n, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nb, n_time),
        out_shape=jax.ShapeDtypeStruct((n, B), dtype),
        in_specs=[lane2(n), band_old, band_new, lane2(8), full, full, full],
        out_specs=lane2(n),
        scratch_shapes=[pltpu.VMEM((n, BLK), dtype)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return out(pay, bands, bands, sc, m0, mN, mi)
