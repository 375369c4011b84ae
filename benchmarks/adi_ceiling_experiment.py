#!/usr/bin/env python
"""Fused-ADI batch-ceiling experiment (round-4 verdict weak #5).

Question: 16.6k options/s at B=512 (34 us/option) — can the sweep
recurrences be pipelined/vectorized to lift the ceiling, or is that the
floor?  Hypotheses measured here, one JSON row per variant:

H1 (loop overhead): each march step runs ~300 serial fori_loop
    iterations whose bodies touch a single (1, nv, 128) or (nS, 1, 128)
    slice — if Mosaic's per-iteration loop overhead dominates, partial
    UNROLLING of the sweep loops lifts throughput with no math change.
H2 (sublane starvation): the v-sweep's (nS, 1, B) slices keep one
    sublane of eight live per vector op — replacing the serial Thomas
    v-solve with PARALLEL CYCLIC REDUCTION (log2(nv) levels of
    full-array shifted fmas, level coefficients precomputed once since
    the implicit operator is time-independent) trades ~4x the flops for
    full-tile execution.
H3 (both): PCR for the v-sweep + unrolled S-sweep.

Every variant must agree with the baseline prices to f32 tolerance
(max rel diff printed per row; the run aborts if > 2e-3).

Usage:  python benchmarks/adi_ceiling_experiment.py        (real TPU)
"""

import json
import sys
import time

import numpy as np


def main():
    from pde_tpu.utils.device_guard import ensure_live_backend

    mode = ensure_live_backend()

    import jax
    import jax.numpy as jnp

    from pde_tpu.solvers import heston_adi

    f32 = jnp.float32
    B = 512
    Kf = jnp.asarray(np.linspace(85.0, 115.0, B), f32)
    Tf = jnp.asarray(np.linspace(0.25, 1.5, B), f32)
    cf = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    print(f"# device={jax.devices()[0]} mode={mode} B={B} grid=100x50x100",
          file=sys.stderr)

    def run(label, **kw):
        fn = lambda: heston_adi.solve_fused_batch(  # noqa: E731
            2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.02, Tf, Kf, cf, 100.0,
            n_time=100, **kw,
        ).price
        out = fn()
        jax.block_until_ready(out)

        def batch(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn()
            float(np.asarray(o)[0])
            return time.perf_counter() - t0

        pers = []
        for _ in range(3):
            t_s, t_l = batch(2), batch(8)
            if t_l > t_s:
                pers.append((t_l - t_s) / 6.0)
        per = min(pers) if pers else batch(8) / 8.0
        return np.asarray(out), per

    base_prices, per0 = run("baseline")
    rows = [("baseline_thomas_unroll1", per0, 0.0, dict())]
    variants = [
        # Mosaic fori_loop supports only unroll=1 or FULL unroll (True)
        ("thomas_unroll_full", dict(unroll=True)),
        ("pcr_v_unroll1", dict(pcr_v=True)),
        ("pcr_v_sweep_unroll_full", dict(pcr_v=True, unroll=True)),
        ("pcr_both", dict(pcr_v=True, pcr_s=True)),
        # repeats to separate variant effects from tunnel-state drift
        ("thomas_unroll_full_rep", dict(unroll=True)),
        ("pcr_v_unroll1_rep", dict(pcr_v=True)),
    ]
    for label, kw in variants:
        try:
            prices, per = run(label, **kw)
            rel = float(np.max(np.abs(prices - base_prices)
                               / np.maximum(np.abs(base_prices), 1e-6)))
            rows.append((label, per, rel, kw))
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(json.dumps({"variant": label, "error": repr(exc)[:300]}))

    for label, per, rel, kw in rows:
        print(json.dumps({
            "variant": label,
            "options_per_sec": round(B / per, 1),
            "us_per_option": round(1e6 * per / B, 2),
            "max_rel_diff_vs_baseline": float(f"{rel:.2e}"),
        }))
        if rel > 2e-3:
            print(f"# ACCURACY FAILURE in {label}", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
