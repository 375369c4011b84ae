"""Linear-complementarity (obstacle) solvers: projected SOR, TPU-native.

BASELINE.json names the free-boundary PSOR formulation (Leung & Li 2015) as a
benchmark config; the reference itself only ships the simpler
implicit-then-project splitting (hjb_solver.hpp:163-178, also used for
American exercise in its PDE solvers).  This module provides the rigorous
LCP solve:

    A x >= b,   x >= g,   (x - g)^T (A x - b) = 0

for tridiagonal A, via **red-black projected SOR**: classic PSOR sweeps are
sequential in i, but for a tridiagonal operator the even rows depend only on
odd neighbours and vice versa, so each half-sweep is one fully vectorized
VPU update — the natural TPU formulation.  Fixed iteration counts keep it
jittable; the residual is returned for monitoring.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["projected_sor", "psor_step"]


def _apply_tridiag(lower, diag, upper, x):
    """A x for tridiagonal A (lower/upper length n-1)."""
    out = diag * x
    out = out.at[..., 1:].add(lower * x[..., :-1])
    out = out.at[..., :-1].add(upper * x[..., 1:])
    return out


def psor_step(lower, diag, upper, b, g, x, omega, red_mask, black_mask):
    """One red-black projected SOR sweep (two vectorized half-updates)."""

    def half(x, mask):
        # Gauss-Seidel update for every row simultaneously; 'mask' selects
        # which color actually commits.  Rows of one color only read the
        # other color's entries, so the parallel update is exact GS.
        neighbor = jnp.zeros_like(x)
        neighbor = neighbor.at[..., 1:].add(lower * x[..., :-1])
        neighbor = neighbor.at[..., :-1].add(upper * x[..., 1:])
        gs = (b - neighbor) / diag
        x_new = x + omega * (gs - x)
        x_new = jnp.maximum(x_new, g)  # projection onto the obstacle
        return jnp.where(mask, x_new, x)

    x = half(x, red_mask)
    x = half(x, black_mask)
    return x


@partial(jax.jit, static_argnames=("n_iter",))
def projected_sor(
    lower,
    diag,
    upper,
    b,
    g,
    x0=None,
    omega: float = 1.5,
    n_iter: int = 60,
):
    """Solve the tridiagonal LCP with n_iter red-black PSOR sweeps.

    Shapes: lower/upper (..., n-1), diag/b/g/x0 (..., n); broadcasts over
    leading batch dims (vmap over options/spreads for books of American
    options / stopping problems).

    Returns (x, residual) where residual = max |min(A x - b, x - g)| — the
    LCP complementarity residual (0 at the exact solution).
    """
    lower = jnp.asarray(lower)
    diag = jnp.asarray(diag)
    upper = jnp.asarray(upper)
    b = jnp.asarray(b)
    g = jnp.asarray(g)
    n = diag.shape[-1]

    x = jnp.maximum(b / diag, g) if x0 is None else jnp.maximum(jnp.asarray(x0), g)

    idx = jnp.arange(n)
    red = (idx % 2 == 0)
    black = ~red

    def body(x, _):
        return psor_step(lower, diag, upper, b, g, x, omega, red, black), None

    x, _ = jax.lax.scan(body, x, None, length=n_iter)

    resid = jnp.max(jnp.abs(jnp.minimum(_apply_tridiag(lower, diag, upper, x) - b, x - g)))
    return x, resid
