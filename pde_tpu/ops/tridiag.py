"""Batched tridiagonal (Thomas) solvers — the PDE inner kernel.

The reference solves one tridiagonal system at a time in C++
(solve_tridiagonal, src/cpp/solvers/pde_core.hpp:408-436), relying on the ADI
sweep loops for parallelism.  On TPU the win is the opposite layout: the
recurrence stays sequential in the system dimension but thousands of
*independent* systems (v-slices x options x strikes) ride the 8x128 VPU lanes
in lockstep.  Three implementations:

* :func:`thomas` — ``lax.scan`` over the system axis with arbitrary leading
  batch dims.  Works on any backend/dtype (float64 parity mode) and is the
  autodiff-able reference.
* :func:`thomas_pallas` — a Pallas TPU kernel holding the whole batch of
  systems in VMEM, forward sweep + back substitution in one fused kernel
  (float32).  Batch is tiled over a grid in blocks of 128 lanes.
* :func:`pcr` — parallel cyclic reduction for the opposite regime: FEW but
  very LONG systems, where the sequential scan leaves the chip idle
  (~200x faster than the scan for one 65k-point system on v5e).

:func:`tridiagonal_solve` dispatches between them by regime.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["thomas", "thomas_factor", "thomas_solve_factored", "ThomasFactors",
           "thomas_pallas", "pcr", "tridiagonal_solve"]


class ThomasFactors(NamedTuple):
    """Precomputed forward-elimination state for a time-INDEPENDENT system.

    Implicit time marches (CN/implicit BS, ADI sweeps, HJB projection) solve
    the same tridiagonal operator every step with a new right-hand side;
    re-eliminating the matrix each step wastes the serial chain on divisions.
    :func:`thomas_factor` runs the elimination once; per-step
    :func:`thomas_solve_factored` is then multiply/fma-only in the sequential
    dimension.
    """

    cp: jnp.ndarray     # (..., n) super-diag multipliers; cp[..., n-1] = 0
    inv_m: jnp.ndarray  # (..., n) reciprocal pivots
    lo: jnp.ndarray     # (..., n) row-aligned sub-diagonal; lo[..., 0] = 0


def thomas_factor(lower, diag, upper) -> ThomasFactors:
    """Forward-eliminate the matrix only (shapes as :func:`thomas`)."""
    lower, diag, upper = map(jnp.asarray, (lower, diag, upper))
    n = diag.shape[-1]
    batch = jnp.broadcast_shapes(lower.shape[:-1], diag.shape[:-1],
                                 upper.shape[:-1])
    zeros = jnp.zeros(batch + (1,), diag.dtype)
    lo = jnp.concatenate([zeros, jnp.broadcast_to(lower, batch + (n - 1,))], -1)
    up = jnp.concatenate([jnp.broadcast_to(upper, batch + (n - 1,)), zeros], -1)
    d = jnp.broadcast_to(diag, batch + (n,))

    def front(a):
        return jnp.moveaxis(a, -1, 0)

    c0 = up[..., 0] / d[..., 0]
    inv0 = 1.0 / d[..., 0]

    def fwd(c_prev, x):
        lo_i, d_i, up_i = x
        inv_m = 1.0 / (d_i - lo_i * c_prev)
        c_i = up_i * inv_m
        return c_i, (c_i, inv_m)

    _, (cs, invs) = jax.lax.scan(
        fwd, c0, (front(lo)[1:], front(d)[1:], front(up)[1:]))
    cp = jnp.concatenate([c0[None], cs], axis=0)
    inv_m = jnp.concatenate([inv0[None], invs], axis=0)
    return ThomasFactors(jnp.moveaxis(cp, 0, -1), jnp.moveaxis(inv_m, 0, -1), lo)


def thomas_solve_factored(factors: ThomasFactors, rhs):
    """Solve with precomputed factors; only fma/multiply in the serial chain."""
    rhs = jnp.asarray(rhs)
    cp, inv_m, lo = factors
    n = cp.shape[-1]
    batch = jnp.broadcast_shapes(cp.shape[:-1], rhs.shape[:-1])
    b = jnp.broadcast_to(rhs, batch + (n,))
    cp = jnp.broadcast_to(cp, batch + (n,))
    inv_m = jnp.broadcast_to(inv_m, batch + (n,))
    lo = jnp.broadcast_to(lo, batch + (n,))

    def front(a):
        return jnp.moveaxis(a, -1, 0)

    dp0 = b[..., 0] * inv_m[..., 0]

    def fwd(dp_prev, x):
        lo_i, b_i, inv_i = x
        dp_i = (b_i - lo_i * dp_prev) * inv_i
        return dp_i, dp_i

    _, dps = jax.lax.scan(
        fwd, dp0, (front(lo)[1:], front(b)[1:], front(inv_m)[1:]))
    dps = jnp.concatenate([dp0[None], dps], axis=0)

    def bwd(x_next, x):
        c_i, dp_i = x
        x_i = dp_i - c_i * x_next
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, dps[-1], (front(cp)[:-1], dps[:-1]), reverse=True)
    xs = jnp.concatenate([xs, dps[-1][None]], axis=0)
    return jnp.moveaxis(xs, 0, -1)


def thomas(lower: jnp.ndarray, diag: jnp.ndarray, upper: jnp.ndarray, rhs: jnp.ndarray):
    """Solve tridiagonal systems along the last axis.

    Shapes (broadcast-compatible leading batch dims allowed):
      lower: (..., n-1)   sub-diagonal (A[i, i-1] = lower[i-1])
      diag:  (..., n)     main diagonal
      upper: (..., n-1)   super-diagonal (A[i, i+1] = upper[i])
      rhs:   (..., n)

    Same convention as the reference solve_tridiagonal (pde_core.hpp:408-436).
    The scan is over the system axis; every step is a vectorized op over the
    batch, so a (B, n) batch runs as n sequential (B,)-wide VPU ops.
    """
    lower, diag, upper, rhs = map(jnp.asarray, (lower, diag, upper, rhs))
    n = diag.shape[-1]
    batch = jnp.broadcast_shapes(
        lower.shape[:-1], diag.shape[:-1], upper.shape[:-1], rhs.shape[:-1]
    )
    lower = jnp.broadcast_to(lower, batch + (n - 1,))
    diag = jnp.broadcast_to(diag, batch + (n,))
    upper = jnp.broadcast_to(upper, batch + (n - 1,))
    rhs = jnp.broadcast_to(rhs, batch + (n,))

    # move the system axis to the front for scanning: (n, ...batch)
    def front(a):
        return jnp.moveaxis(a, -1, 0)

    lo = front(lower)  # (n-1, B...)
    d = front(diag)  # (n,   B...)
    up = front(upper)  # (n-1, B...)
    b = front(rhs)  # (n,   B...)

    zeros = jnp.zeros_like(d[0])
    up_padded = jnp.concatenate([up, zeros[None]], axis=0)  # upper[n-1] := 0
    lo_padded = jnp.concatenate([zeros[None], lo], axis=0)  # lower[-1]  := 0

    c0 = up_padded[0] / d[0]
    d0 = b[0] / d[0]

    def fwd(carry, x):
        c_prev, dp_prev = carry
        lo_i, d_i, up_i, b_i = x
        m = d_i - lo_i * c_prev
        c_i = up_i / m
        dp_i = (b_i - lo_i * dp_prev) / m
        return (c_i, dp_i), (c_i, dp_i)

    (_, _), (cs, dps) = jax.lax.scan(
        fwd, (c0, d0), (lo_padded[1:], d[1:], up_padded[1:], b[1:])
    )
    cs = jnp.concatenate([c0[None], cs], axis=0)  # (n, B...)
    dps = jnp.concatenate([d0[None], dps], axis=0)

    def bwd(x_next, x):
        c_i, dp_i = x
        x_i = dp_i - c_i * x_next
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, dps[-1], (cs[:-1], dps[:-1]), reverse=True)
    xs = jnp.concatenate([xs, dps[-1][None]], axis=0)
    return jnp.moveaxis(xs, 0, -1)


@functools.partial(jax.jit, static_argnames=("block_b",))
def thomas_pallas(lower, diag, upper, rhs, block_b: int = 128):
    """Pallas TPU kernel: solve B independent n-point systems in VMEM.

    Shapes: lower (B, n-1), diag (B, n), upper (B, n-1), rhs (B, n) -> (B, n).

    Layout: systems are transposed to (n, B) so each recurrence step is a
    (1, block_b) VPU row op; forward elimination and back substitution run
    inside a single kernel with all state held in VMEM scratch (no HBM
    round-trips between sweeps).  float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = rhs.shape
    dtype = jnp.float32
    # pad batch to a lane multiple; pad diag with ones to keep systems valid
    Bp = ((B + block_b - 1) // block_b) * block_b
    pad = Bp - B

    def prep(a, fill):
        a = a.astype(dtype)
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)), constant_values=fill)
        return a.T  # (rows, Bp)

    # align all operands to n rows so the kernel indexes row i only:
    #   lo[i] multiplies x[i-1] in row i (lo[0] = 0)
    #   up[i] multiplies x[i+1] in row i (up[n-1] = 0, which also makes
    #   c[n-1] = 0 without a conditional)
    zcol = jnp.zeros((lower.shape[0], 1), dtype)
    lo_t = prep(jnp.concatenate([zcol, lower.astype(dtype)], axis=1), 0.0)
    up_t = prep(jnp.concatenate([upper.astype(dtype), zcol], axis=1), 0.0)
    d_t = prep(diag, 1.0)
    b_t = prep(rhs, 0.0)

    def kernel(lo_ref, d_ref, up_ref, b_ref, out_ref, c_scr, dp_scr):
        c_scr[0, :] = up_ref[0, :] / d_ref[0, :]
        dp_scr[0, :] = b_ref[0, :] / d_ref[0, :]

        def fwd(i, _):
            li = lo_ref[i, :]
            m = d_ref[i, :] - li * c_scr[i - 1, :]
            inv_m = 1.0 / m
            c_scr[i, :] = up_ref[i, :] * inv_m
            dp_scr[i, :] = (b_ref[i, :] - li * dp_scr[i - 1, :]) * inv_m
            return 0

        jax.lax.fori_loop(1, n, fwd, 0, unroll=False)

        out_ref[n - 1, :] = dp_scr[n - 1, :]

        def bwd(k, _):
            i = n - 2 - k
            out_ref[i, :] = dp_scr[i, :] - c_scr[i, :] * out_ref[i + 1, :]
            return 0

        jax.lax.fori_loop(0, n - 1, bwd, 0, unroll=False)

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, Bp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, block_b), dtype),
            pltpu.VMEM((n, block_b), dtype),
        ],
    )(lo_t, d_t, up_t, b_t)

    return out.T[:B]


@jax.jit
def pcr(lower: jnp.ndarray, diag: jnp.ndarray, upper: jnp.ndarray, rhs: jnp.ndarray):
    """Parallel cyclic reduction along the last axis — for LONG single systems.

    Thomas (:func:`thomas`) is optimal when thousands of independent systems
    ride the VPU lanes, but it is O(n) *sequential* in the system dimension;
    with few systems and a very long grid (n >= ~1e4) the chip idles.  PCR is
    the TPU-shaped alternative (SURVEY.md §7 "cyclic-reduction for very long
    single systems"): ceil(log2(n)) rounds, each a fully-vectorized O(n)
    elimination of the odd/even neighbours at stride 1, 2, 4, ..., after
    which every equation is decoupled and x = d / b.  Total work is
    O(n log n) FLOPs — more than Thomas's O(n) — but every round is one
    shifted-add tensor op, so wall-clock is ~log2(n) launches regardless of
    batch width.

    Same shape/signature conventions as :func:`thomas`; broadcastable
    leading batch dims.  Numerically requires diagonal dominance (satisfied
    by the CN/ADI/implicit-obstacle systems this framework builds).
    """
    import math

    lower, diag, upper, rhs = map(jnp.asarray, (lower, diag, upper, rhs))
    n = diag.shape[-1]
    batch = jnp.broadcast_shapes(
        lower.shape[:-1], diag.shape[:-1], upper.shape[:-1], rhs.shape[:-1]
    )
    zero = jnp.zeros(batch + (1,), diag.dtype)
    # row-aligned bands: a[i] multiplies x[i-s], c[i] multiplies x[i+s]
    a = jnp.concatenate([zero, jnp.broadcast_to(lower, batch + (n - 1,))], axis=-1)
    c = jnp.concatenate([jnp.broadcast_to(upper, batch + (n - 1,)), zero], axis=-1)
    b = jnp.broadcast_to(diag, batch + (n,))
    d = jnp.broadcast_to(rhs, batch + (n,))

    def shift_down(x, s):  # value of row i-s, identity rows beyond the edge
        return jnp.concatenate([jnp.zeros(batch + (s,), x.dtype), x[..., :-s]], axis=-1)

    def shift_up(x, s):  # value of row i+s
        return jnp.concatenate([x[..., s:], jnp.zeros(batch + (s,), x.dtype)], axis=-1)

    s = 1
    for _ in range(max(1, math.ceil(math.log2(n)))):
        # neighbour rows at distance s; out-of-range neighbours are the
        # identity equation (b=1, a=c=d=0), which eliminates to a no-op
        b_dn = jnp.where(shift_down(jnp.ones_like(b), s) > 0, shift_down(b, s), 1.0)
        b_up = jnp.where(shift_up(jnp.ones_like(b), s) > 0, shift_up(b, s), 1.0)
        alpha = -a / b_dn
        gamma = -c / b_up
        b = b + alpha * shift_down(c, s) + gamma * shift_up(a, s)
        d = d + alpha * shift_down(d, s) + gamma * shift_up(d, s)
        a = alpha * shift_down(a, s)
        c = gamma * shift_up(c, s)
        if s < n:
            s *= 2
    return d / b


def tridiagonal_solve(lower, diag, upper, rhs, use_pallas: bool | None = None):
    """Dispatch on the batch/length regime.

    - Few, very long systems -> :func:`pcr` (log2(n) vectorized rounds; on
      TPU v5e a single 65k-point solve is ~200x faster than the scan).
    - Wide float32 2D batches on TPU -> :func:`thomas_pallas` (VMEM kernel).
    - Everything else -> :func:`thomas` (portable, differentiable).
    """
    rhs = jnp.asarray(rhs)
    n = rhs.shape[-1]
    batch_size = int(np.prod(rhs.shape[:-1])) if rhs.ndim > 1 else 1
    if use_pallas is None and n >= 8192 and batch_size <= 16:
        return pcr(lower, diag, upper, rhs)
    if use_pallas is None:
        use_pallas = (
            rhs.ndim == 2
            and rhs.dtype == jnp.float32
            and jax.default_backend() == "tpu"
        )
    if use_pallas:
        # thomas() accepts bands broadcastable against the rhs batch (e.g.
        # shared 1-D diagonals for every system); the Pallas kernel needs
        # fully materialized per-system bands, so broadcast first
        lower, diag, upper = (
            jnp.broadcast_to(jnp.asarray(b), rhs.shape[:-1] + (m,))
            for b, m in ((lower, n - 1), (diag, n), (upper, n - 1))
        )
        return thomas_pallas(lower, diag, upper, rhs)
    return thomas(lower, diag, upper, rhs)
