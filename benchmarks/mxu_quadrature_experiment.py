#!/usr/bin/env python
"""MXU-route prototype for the grouped Carr-Madan contraction — REJECTED.

The grouped pricer's per-strike reduction is a (maturities x nodes) x
(nodes x strikes) contraction, so this script races the shipping VPU path
(models/heston.price_carr_madan_grouped: row gather + elementwise
cos/sin + sum) against real/imag-split MXU matmuls
``R = Re(cfw) @ cos(vL) - Im(cfw) @ sin(vL)`` with a per-option row gather
after, at the bench configuration (8,192 options x 8 maturities x 1,023
nodes), plus the DE-population variant where the phase matrix is shared
across members (reference hot loop: heston.cpp:124-137 per option;
heston_calibrator.py:486-513 per member).

Measured on v5e (2026-08-19, recorded in docs/performance.md): the MXU
route is SLOWER (19.2M vs 27.6M options/s even at Precision.HIGHEST) and
default bf16 accumulation is numerically unusable on this cancellation-
heavy integrand (240% price error).  The contraction is thin (M = 8 rows
vs 128x128 tiles) and was never the bottleneck — the per-(option, node)
cos/sin pair is.  Kept as a runnable artifact so the conclusion can be
re-checked on future hardware where the matmul/transcendental balance
shifts.

Run SOLO on the TPU box: ``python benchmarks/mxu_quadrature_experiment.py``.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.lax import Precision

from pde_tpu.models import heston
from pde_tpu.models.heston import (DU, INTEGRATION_ALPHA, N_QUADRATURE,
                                   HestonParams, _cf_reduced,
                                   _price_from_integral)

f32 = jnp.float32


def timeit(fn, n=50, trials=3):
    jax.block_until_ready(fn())

    def run(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    pers = []
    for _ in range(trials):
        a = run(2)
        b = run(n + 2)
        p = (b - a) / n
        if p > 0:
            pers.append(p)
    return min(pers) if pers else float("nan")


def main():
    params = HestonParams(2.0, 0.04, 0.3, -0.7, 0.04)
    n_opts = 8192
    strikes = jnp.asarray(np.linspace(60, 140, n_opts), f32)
    mats_np = np.tile(np.linspace(0.1, 2.0, 8), n_opts // 8)
    uT, idx = heston.group_maturities(mats_np)
    idx_j, uT_j = jnp.asarray(idx), jnp.asarray(uT, f32)

    base = jax.jit(lambda: heston.price_carr_madan_grouped(
        params, strikes, idx_j, uT_j, 100.0, 0.05, 0.02))
    p0 = np.asarray(jax.block_until_ready(base()))
    per = timeit(base, n=100)
    print(f"baseline grouped (VPU path): {n_opts/per/1e6:.1f} M opts/s")

    def price_mxu(prec):
        rdt, cdt = f32, jnp.complex64
        v = jnp.arange(1, N_QUADRATURE, dtype=rdt) * jnp.asarray(DU, rdt)
        alpha = INTEGRATION_ALPHA
        u = v.astype(cdt) - 1j * (alpha + 1.0)
        Tm = uT_j[:, None]
        cf = _cf_reduced(params, u, Tm, rdt, cdt)
        denom = (alpha * alpha + alpha - v * v) + 1j * ((2.0 * alpha + 1.0) * v)
        cfw = cf * (1.0 / denom.astype(cdt))                   # (M, n_u)
        T = uT_j[idx_j]
        log_fk = jnp.log(100.0 / strikes) + (0.05 - 0.02) * T
        vl = v[:, None] * log_fk[None, :]                      # (n_u, N)
        C, S = jnp.cos(vl), jnp.sin(vl)
        R = (jnp.matmul(cfw.real, C, precision=prec)
             - jnp.matmul(cfw.imag, S, precision=prec))        # (M, N)
        integral = DU * jnp.take_along_axis(R, idx_j[None, :], axis=0)[0]
        return _price_from_integral(
            integral, strikes, T, 100.0, 0.05, 0.02, True, alpha, rdt)

    for prec in (Precision.DEFAULT, Precision.HIGHEST):
        fn = jax.jit(lambda prec=prec: price_mxu(prec))
        p1 = np.asarray(jax.block_until_ready(fn()))
        err = np.max(np.abs(p1 - p0) / np.maximum(np.abs(p0), 1e-3))
        per = timeit(fn, n=100)
        print(f"mxu prec={prec}: {n_opts/per/1e6:.1f} M opts/s, "
              f"max rel err vs baseline {err:.2e}")


if __name__ == "__main__":
    main()
