#!/usr/bin/env python3
"""Measure the REFERENCE implementation on this box -> REFERENCE_MEASURED.json.

Round-1 VERDICT: every vs_baseline in the bench compared against the
reference's *published design targets*; this script replaces those with
measured-vs-measured numbers.

Two measurement families:

1. Engine micro-benchmarks: compiles benchmarks/reference_bench.cpp against
   the read-only reference C++ sources (-O3 -march=native, the reference's
   own CMake flags) and reproduces /root/reference/benchmarks/
   python_vs_cpp.py's configs without pybind11 overhead.

2. Two-stage surface calibration, the reference's north-star path
   (heston_calibrator.py:416-477): scipy differential_evolution
   (maxiter=100, popsize=15, seed=42, polish=False, updating="immediate")
   then least_squares TRF, with the objective/residual semantics of
   _compute_objective/_compute_residuals (:486-536), pricing through the
   compiled reference engine via ctypes.  Measured for the 50-option design
   surface (design-doc.md:493 target <30 s) and the 108-quote flagship
   surface bench.py uses.

Usage: python benchmarks/run_reference_bench.py [--skip-calibration]
"""

from __future__ import annotations

import ctypes
import json
import os
import platform
import subprocess
import sys
import time
from datetime import datetime, timezone

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SRC = os.path.join(REPO, "benchmarks", "reference_bench.cpp")
OUT_JSON = os.path.join(REPO, "benchmarks", "REFERENCE_MEASURED.json")

CXX_FLAGS = [
    "-O3", "-march=native", "-std=c++17", "-fopenmp", "-include", "tuple",
    f"-I{REF}/src/cpp",
]


def _find_eigen() -> str | None:
    """Eigen ships inside the image's tensorflow wheel (no system install)."""
    import glob
    import sysconfig
    candidates = ["/usr/include/eigen3"]
    site = sysconfig.get_paths().get("purelib", "")
    if site:
        candidates.append(os.path.join(site, "tensorflow", "include"))
    candidates.extend(glob.glob("/opt/venv/lib/python3*/site-packages/tensorflow/include"))
    for c in candidates:
        if os.path.isdir(os.path.join(c, "Eigen")):
            return c
    return None


_EIGEN = _find_eigen()
if _EIGEN:
    # unlocks the reference PDE solver timings (REF_BENCH_WITH_PDE section).
    # -mno-avx512fp16: the tensorflow-bundled Eigen miscompiles its AVX512FP16
    # packet specializations under -march=native on this toolchain; the PDE
    # solvers are float64 so the flag costs nothing.
    CXX_FLAGS += ["-DREF_BENCH_WITH_PDE", f"-I{_EIGEN}", "-mno-avx512fp16"]
REF_SOURCES = [
    f"{REF}/src/cpp/models/heston.cpp",
    f"{REF}/src/cpp/models/sabr.cpp",
    f"{REF}/src/cpp/models/ou_process.cpp",
]

BOUNDS = [(0.1, 10.0), (0.01, 1.0), (0.01, 2.0), (-0.99, 0.99), (0.01, 1.0)]
TRUTH = np.array([2.0, 0.04, 0.3, -0.7, 0.04])


def build(tmp: str = "/tmp") -> tuple[str, str]:
    exe = os.path.join(tmp, "reference_bench")
    lib = os.path.join(tmp, "libreference_bench.so")
    subprocess.run(["g++", *CXX_FLAGS, SRC, *REF_SOURCES, "-o", exe], check=True)
    subprocess.run(
        ["g++", *CXX_FLAGS, "-shared", "-fPIC", SRC, *REF_SOURCES, "-o", lib],
        check=True,
    )
    return exe, lib


def load_pricer(lib_path: str):
    lib = ctypes.CDLL(lib_path)
    fn = lib.ref_heston_price_options
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]

    def price(x, strikes, maturities, S0, r, q, is_call=True):
        x = np.ascontiguousarray(x, dtype=np.float64)
        k = np.ascontiguousarray(strikes, dtype=np.float64)
        t = np.ascontiguousarray(maturities, dtype=np.float64)
        out = np.empty(len(k))
        fn(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            k.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(k), S0, r, q, 1 if is_call else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out

    return price


def load_sabr_vols(lib_path: str):
    lib = ctypes.CDLL(lib_path)
    fn = lib.ref_sabr_implied_vols
    fn.argtypes = [
        ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]

    def vols(beta, strikes, F, T, alpha, rho, nu):
        k = np.ascontiguousarray(strikes, dtype=np.float64)
        out = np.empty(len(k))
        fn(beta, k.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(k),
           F, T, alpha, rho, nu,
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out

    return vols


def measure_sabr_calibration(vols, n_strikes=11, n_maturities=10,
                             beta=0.5, F0=100.0, r=0.05, q=0.02):
    """Reference SABR smile fit semantics, measured: scipy SLSQP over
    (alpha, rho, nu), ftol=1e-10, maxiter=200, ATM-seeded x0, DEFAULT_BOUNDS
    (sabr_calibrator.py:316-333, 129-134), with each objective evaluation
    pricing through the compiled reference C++ Hagan evaluator (vectorized —
    favourable vs the reference's own per-strike Python loop).  Design
    targets: <1 s/smile, <10 s/surface (design-doc.md:695-696)."""
    from scipy.optimize import minimize

    truth = (0.25, -0.35, 0.45)  # alpha, rho, nu
    bounds = [(0.001, 2.0), (-0.99, 0.99), (0.001, 3.0)]
    strikes = np.linspace(80.0, 120.0, n_strikes)
    mats = np.linspace(0.1, 2.0, n_maturities)

    def fit_one(T):
        F = F0 * np.exp((r - q) * T)
        market = vols(beta, strikes, F, T, *truth)
        atm_idx = int(np.argmin(np.abs(strikes - F)))
        x0 = np.array([market[atm_idx] * F ** (1.0 - beta), -0.3, 0.5])

        def objective(x):
            m = vols(beta, strikes, F, T, x[0], x[1], x[2])
            e = m - market
            return float(np.sum(e * e)) / len(strikes)

        res = minimize(objective, x0, method="SLSQP", bounds=bounds,
                       options={"ftol": 1e-10, "maxiter": 200})
        m = vols(beta, strikes, F, T, *res.x)
        return res, float(np.sqrt(np.mean((m - market) ** 2)))

    # single smile: best of 3 (favourable to the reference)
    smile_times, rmses, recovered = [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        res, rmse = fit_one(1.0)
        smile_times.append(time.perf_counter() - t0)
        rmses.append(rmse)
        recovered.append(bool(np.allclose(res.x, truth, atol=0.02)))
    # full surface: serial loop over maturities (the reference's calibrate())
    t0 = time.perf_counter()
    for T in mats:
        fit_one(float(T))
    surface_s = time.perf_counter() - t0
    return {
        "smile_fit_ms": 1000.0 * min(smile_times),
        "surface_fit_s": surface_s,
        "n_strikes": n_strikes,
        "n_maturities": n_maturities,
        "rmse": min(rmses),
        "recovered": all(recovered),
    }


def measure_calibration(price, strikes, maturities, S0=100.0, r=0.05, q=0.02):
    """Reference two-stage calibration semantics, measured."""
    from scipy.optimize import differential_evolution, least_squares

    market = np.maximum(price(TRUTH, strikes, maturities, S0, r, q), 0.01)

    def objective(x):
        m = price(x, strikes, maturities, S0, r, q)
        if np.any(np.isnan(m)) or np.any(m <= 0):  # heston_calibrator.py:507
            return 1e10
        e = (m - market) / market
        return float(np.sum(e * e))

    def residuals(x):
        m = np.maximum(price(x, strikes, maturities, S0, r, q), 1e-10)  # :533
        return (m - market) / market

    t0 = time.perf_counter()
    de = differential_evolution(
        objective, bounds=BOUNDS, maxiter=100, popsize=15, seed=42,
        workers=1, updating="immediate", polish=False,
    )
    lm = least_squares(
        residuals, x0=de.x,
        bounds=(np.array([b[0] for b in BOUNDS]), np.array([b[1] for b in BOUNDS])),
        method="trf", ftol=1e-8, xtol=1e-8,
    )
    wall = time.perf_counter() - t0
    model = np.maximum(price(lm.x, strikes, maturities, S0, r, q), 1e-10)
    rmse = float(np.sqrt(np.mean((model - market) ** 2)))
    return {
        "wall_s": wall,
        "n_options": int(len(strikes)),
        "de_nit": int(de.nit),
        "de_nfev": int(de.nfev),
        "lm_nfev": int(lm.nfev),
        "rmse": rmse,
        "params": [float(v) for v in lm.x],
        "recovered": bool(np.allclose(lm.x, TRUTH, atol=0.05)),
    }


def main():
    exe, lib_path = build()
    # best-of-3 exe runs: the box is shared, so take the fastest observation
    # per metric (most favourable to the reference)
    runs = [
        json.loads(subprocess.run([exe], capture_output=True, text=True, check=True).stdout)
        for _ in range(3)
    ]
    micro = {
        k: (min(r[k] for r in runs) if k.endswith(("_ms", "_us", "_s"))
            else max(r[k] for r in runs) if k.endswith("_per_sec")
            else runs[0][k])
        for k in runs[0]
    }

    result = {
        "measured_at": datetime.now(timezone.utc).isoformat(),
        "host": {
            "machine": platform.machine(),
            "processor": platform.processor(),
            "n_cpus": os.cpu_count(),
            "python": sys.version.split()[0],
        },
        "compile_flags": " ".join(CXX_FLAGS),
        "micro": micro,
    }

    # SABR smile/surface fits are quick (<1 min) — always re-measure
    result["sabr_calibration"] = measure_sabr_calibration(
        load_sabr_vols(lib_path))

    if "--skip-calibration" not in sys.argv:
        price = load_pricer(lib_path)
        # 50-option design surface (design-doc.md:493: target <30 s)
        K50, T50 = np.meshgrid(np.linspace(85.0, 115.0, 10), np.linspace(0.25, 1.5, 5))
        result["calibration_50"] = measure_calibration(price, K50.ravel(), T50.ravel())
        # 108-quote flagship surface (bench.py's configuration)
        K108, T108 = np.meshgrid(np.linspace(85.0, 115.0, 12), np.linspace(0.25, 1.5, 9))
        result["calibration_108"] = measure_calibration(price, K108.ravel(), T108.ravel())
    else:
        # keep the previously-measured calibration results (they take ~10 min)
        try:
            with open(OUT_JSON) as f:
                prev = json.load(f)
            for key in ("calibration_50", "calibration_108"):
                if key in prev:
                    result[key] = prev[key]
        except (OSError, ValueError):
            pass

    with open(OUT_JSON, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
