"""Smoke-drive the bench harnesses so bench/library signature drift fails in
CI instead of at bench time (the round-1 advisor found bench_full calling a
re-signatured solver entry point; this test makes that class of break loud).

Each bench file runs in a subprocess: bench_full configures its own platform
under BENCH_SMOKE, and a fresh process keeps its jax config (f32, CPU) from
fighting this suite's x64 setup.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_headline_smoke_emits_flagship_rows_then_headline():
    """bench.py (the driver metric) under BENCH_SMOKE: the three flagship
    family rows must emit WITHOUT error keys, and the headline calibration
    row must be the LAST stdout line (the driver parses the final JSON
    line)."""
    env = dict(
        os.environ,
        BENCH_SMOKE="1",
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, "tests", ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, f"bench smoke failed:\n{proc.stderr[-4000:]}"
    rows = [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]
    assert rows[-1]["metric"] == "heston_surface_calibration_wall_s", rows[-1]
    metrics = {r["metric"] for r in rows}
    expected = {
        "heston_adi_fused_batch512_options_per_sec",
        "local_vol_pde_fused_book256_options_per_sec",
        "sabr_smile_calibration_s",
        "heston_surface_calibration_wall_s",
    }
    missing = expected - metrics
    assert not missing, f"bench.py rows missing under smoke: {missing}"
    errors = [r for r in rows if "error" in r]
    assert not errors, f"flagship sections errored under smoke: {errors}"


@pytest.mark.slow
def test_bench_full_smoke_traces_every_section():
    env = dict(
        os.environ,
        BENCH_SMOKE="1",
        # share the suite's persistent XLA cache: the smoke is compile-bound
        # (the two calibration-pipeline programs dominate), and warm repeat
        # runs drop from ~5 min to well under a minute on a 1-core box
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, "tests", ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
        JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="-1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_full.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, f"bench_full smoke failed:\n{proc.stderr[-4000:]}"
    rows = [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]
    metrics = {r["metric"] for r in rows}
    # one row per section of the real bench — a section that stops emitting
    # (or crashes before emitting) fails here
    expected = {
        "heston_pricing_options_per_sec",
        "heston_pricing_grouped_options_per_sec",
        "sabr_vols_per_sec",
        "ou_sim252_paths_per_sec",
        "ou_sim_longpath_steps_per_sec",
        "ou_mle252_fits_per_sec",
        "heston_adi_100x50_steps_per_sec",
        "heston_adi_vmapped16_steps_per_sec",
        "heston_adi_fused_solve_s",
        "heston_adi_batch108_options_per_sec",
        "heston_adi_fused_batch512_options_per_sec",
        "bs_american_book512_options_per_sec",
        "ou_freeboundary_batch64_books_per_sec",
        "heston_american_lcp_solve_s",
        "heston_american_lcp_fused_solve_s",
        "ou_freeboundary_psor_solve_s",
        "heston_batched_calibration_surfaces_per_sec",
        "calibration_to_sizing_pipeline_s",
        "fill_engine_orders_per_sec",
    }
    missing = expected - metrics
    assert not missing, f"bench_full sections missing under smoke: {missing}"
    for r in rows:
        # sub-microsecond smoke timings can round to 0.0; throughputs must
        # stay strictly positive, and nothing may be NaN/negative
        assert r["value"] >= 0 and r["value"] == r["value"], r
        if not r["unit"].endswith("_s"):
            assert r["value"] > 0, r
