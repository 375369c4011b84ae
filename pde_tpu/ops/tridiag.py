"""Batched tridiagonal (Thomas) solvers — the PDE inner kernel.

The reference solves one tridiagonal system at a time in C++
(solve_tridiagonal, src/cpp/solvers/pde_core.hpp:408-436), relying on the ADI
sweep loops for parallelism.  On TPU the win is the opposite layout: the
recurrence stays sequential in the system dimension but thousands of
*independent* systems (v-slices x options x strikes) ride the 8x128 VPU lanes
in lockstep.  Two implementations:

* :func:`thomas` — ``lax.scan`` over the system axis with arbitrary leading
  batch dims.  Works on any backend/dtype (float64 parity mode) and is the
  autodiff-able reference.
* :func:`thomas_pallas` — a Pallas TPU kernel holding the whole batch of
  systems in VMEM, forward sweep + back substitution in one fused kernel
  (float32).  Batch is tiled over a grid in blocks of 128 lanes.

:func:`tridiagonal_solve` dispatches between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["thomas", "thomas_pallas", "tridiagonal_solve"]


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


def tridiagonal_solve(lower, diag, upper, rhs, use_pallas: bool | None = None):
    """Dispatch: Pallas kernel on TPU for 2D float32 batches, scan otherwise."""
    if use_pallas is None:
        use_pallas = (
            rhs.ndim == 2
            and jnp.asarray(rhs).dtype == jnp.float32
            and jax.default_backend() == "tpu"
        )
    if use_pallas:
        return thomas_pallas(lower, diag, upper, rhs)
    return thomas(lower, diag, upper, rhs)
