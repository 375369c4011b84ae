"""Calibration robustness sweep: recovery across random true surfaces.

The headline benchmark (bench.py) calibrates ONE synthetic surface; this
script guards against over-tuning to it by drawing random Heston parameter
sets across the realistic range, generating a 108-quote surface for each,
and requiring the two-stage (coarse-DE -> full-grid LM) pipeline to recover
the parameters to sub-1e-4 relative RMSE.

Run on the TPU for timing, or JAX_PLATFORMS=cpu for a correctness-only
sweep:

    python scripts/robustness_check.py [n_cases]

Latest sweeps: 6/6 (CPU float64, worst rel RMSE 1.7e-6) and 10/10 on the
real TPU v5e (float32, worst rel RMSE 8.5e-8, mean 74 ms/surface).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_cases: int = 6) -> int:
    import jax
    import jax.numpy as jnp

    from pde_tpu.calibrate import HestonCalibrator

    rng = np.random.default_rng(0)
    ok, worst, t_tot = 0, 0.0, 0.0
    for i in range(n_cases):
        true = dict(
            kappa=float(rng.uniform(0.8, 4.0)),
            theta=float(rng.uniform(0.02, 0.1)),
            sigma=float(rng.uniform(0.2, 0.7)),
            rho=float(rng.uniform(-0.85, -0.2)),
            v0=float(rng.uniform(0.02, 0.1)),
        )
        data = HestonCalibrator.generate_synthetic_data(
            strikes=np.linspace(85.0, 115.0, 12),
            maturities=np.linspace(0.25, 1.5, 9),
            **true,
        )
        cal = HestonCalibrator()
        cal.calibrate(data, S0=100.0, r=0.05, q=0.02)  # warm the jit cache
        jax.block_until_ready(jnp.zeros(1))
        t0 = time.perf_counter()
        res = cal.calibrate(data, S0=100.0, r=0.05, q=0.02)
        t = time.perf_counter() - t0
        t_tot += t
        rmse = res.fit_quality["relative_rmse"]
        worst = max(worst, rmse)
        recovered = rmse < 1e-4
        ok += recovered
        print(f"case {i}: rel_rmse={rmse:.2e} t={t * 1e3:.1f}ms "
              f"{'OK' if recovered else 'FAIL'} true={true}")

    print(f"\n{ok}/{n_cases} recovered, worst rel RMSE {worst:.2e}, "
          f"mean latency {t_tot / n_cases * 1e3:.1f} ms")
    return 0 if ok == n_cases else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 6))
