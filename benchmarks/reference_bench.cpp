// Measured reference baseline: times the REFERENCE C++ engines on this box.
//
// Compiled *against* the read-only reference sources (same pattern as
// tests/golden/make_golden.cpp — nothing is copied):
//
//   g++ -O3 -march=native -std=c++17 -fopenmp -include tuple \
//       -I/root/reference/src/cpp benchmarks/reference_bench.cpp \
//       /root/reference/src/cpp/models/{heston,sabr,ou_process}.cpp \
//       -o /tmp/reference_bench
//
// Reproduces the configs of /root/reference/benchmarks/python_vs_cpp.py
// (:41-205) minus the pybind11 call overhead the reference harness carries —
// i.e. this measures the reference engines at their BEST.  Emits one JSON
// object to stdout.  The extern "C" shims at the bottom let
// run_reference_bench.py drive the reference's scipy two-stage calibration
// (heston_calibrator.py:416-477 semantics) against the real C++ pricer via
// ctypes, for a measured calibration wall-clock.

#include <chrono>
#include <cstdio>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "models/heston.hpp"
#include "models/sabr.hpp"
#include "models/ou_process.hpp"

// PDE solvers need Eigen (bundled with the image's tensorflow wheel);
// run_reference_bench.py adds -DREF_BENCH_WITH_PDE -I<eigen> when found.
#ifdef REF_BENCH_WITH_PDE
#include "solvers/black_scholes_pde.hpp"
#include "solvers/heston_pde.hpp"
#include "solvers/hjb_solver.hpp"
#endif

using namespace quant::models;

static volatile double g_sink = 0.0;  // defeat dead-code elimination

template <typename F>
static double time_per_call_ms(F&& fn, int iters) {
    for (int i = 0; i < 5; ++i) fn();
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < iters; ++i) fn();
    auto t1 = std::chrono::steady_clock::now();
    return std::chrono::duration<double, std::milli>(t1 - t0).count() / iters;
}

int main() {
    HestonParameters hp(2.0, 0.04, 0.3, -0.7, 0.04);
    HestonModel heston(hp);

    // python_vs_cpp.py:43-59 — single option
    double single_ms = time_per_call_ms(
        [&] { g_sink = heston.price_option(100.0, 1.0, 100.0, 0.05, 0.02, true); }, 1000);

    // :62-81 — vectorized 100 strikes (OpenMP loop heston.cpp:236-244)
    std::vector<double> strikes(100), mats(100, 1.0);
    for (int i = 0; i < 100; ++i) strikes[i] = 80.0 + 40.0 * i / 99.0;
    double vec100_ms = time_per_call_ms(
        [&] { g_sink = heston.price_options(strikes, mats, 100.0, 0.05, 0.02, true)[0]; }, 100);

    // a 512-option book (the pde_tpu bench's unit of work)
    std::vector<double> strikes512(512), mats512(512);
    for (int i = 0; i < 512; ++i) {
        strikes512[i] = 80.0 + 40.0 * i / 511.0;
        mats512[i] = 0.25 + 1.25 * i / 511.0;
    }
    double vec512_ms = time_per_call_ms(
        [&] { g_sink = heston.price_options(strikes512, mats512, 100.0, 0.05, 0.02, true)[0]; }, 50);

    // :84-100 — price with Greeks
    double greeks_ms = time_per_call_ms(
        [&] { g_sink = heston.price_option_with_greeks(100.0, 1.0, 100.0, 0.05, 0.02, true).price; }, 100);

    // :103-117 — implied vol
    double iv_ms = time_per_call_ms(
        [&] { g_sink = heston.implied_volatility(100.0, 1.0, 100.0, 0.05, 0.02, true); }, 100);

    // :122-138 — SABR single
    SABRModel sabr(0.5);
    double sabr_us = 1000.0 * time_per_call_ms(
        [&] { g_sink = sabr.implied_volatility(105.0, 100.0, 1.0, 0.2, -0.3, 0.4); }, 10000);

    // :141-160 — SABR vectorized 100 strikes
    double sabr100_ms = time_per_call_ms(
        [&] { g_sink = sabr.implied_volatilities(strikes, 100.0, 1.0, 0.2, -0.3, 0.4)[0]; }, 1000);

    // :163-177 — OU simulate 252 steps
    OUParameters op(100.0, 5.0, 2.0);
    double ou_sim_ms = time_per_call_ms(
        [&] { g_sink = OUProcess::simulate(op, 100.0, 1.0, 252, 42)[0]; }, 1000);

    // :180-194 — OU MLE fit
    auto path = OUProcess::simulate(op, 100.0, 1.0, 252, 42);
    double ou_fit_ms = time_per_call_ms(
        [&] { g_sink = OUProcess::fit_mle(path, 1.0 / 252.0).params.mu; }, 1000);

    // :197-209 — OU log-likelihood
    double ou_ll_us = 1000.0 * time_per_call_ms(
        [&] { g_sink = OUProcess::log_likelihood(path, op, 1.0 / 252.0); }, 10000);

#ifdef REF_BENCH_WITH_PDE
    // BS 1D PDE, default 200x100 CN grid (black_scholes_pde.hpp:58-62)
    quant::solvers::BlackScholesPDEParams bsp;
    bsp.q = 0.02;
    double bs_pde_ms = time_per_call_ms(
        [&] { g_sink = quant::solvers::BlackScholesPDESolver(bsp).solve(100.0).price; }, 50);

    // Heston 2D ADI, default 100x50x100 grid (heston_pde.hpp:56-61) —
    // the reference prices books by looping this solve per option
    quant::solvers::HestonPDEParams hpde;  // canonical params, q=0
    double heston_pde_ms = time_per_call_ms(
        [&] { g_sink = quant::solvers::HestonPDESolver(hpde).solve(100.0).price; }, 10);

    quant::solvers::HestonPDEParams hpde_am;
    hpde_am.option_type = quant::solvers::OptionType::Put;
    hpde_am.exercise = quant::solvers::ExerciseStyle::American;
    double heston_pde_am_ms = time_per_call_ms(
        [&] { g_sink = quant::solvers::HestonPDESolver(hpde_am).solve(100.0).price; }, 10);

    // HJB all-boundaries at bench_full.py's config (256x128, costs 0.002)
    quant::solvers::HJBParams jp;
    jp.c_entry = 0.002; jp.c_exit = 0.002; jp.n_space = 256; jp.n_time = 128;
    double hjb_ms = time_per_call_ms(
        [&] { g_sink = quant::solvers::HJBSolver(jp).solve_all_boundaries().entry_long; }, 20);
#endif

    std::printf("{\n");
    std::printf("  \"heston_single_price_ms\": %.6f,\n", single_ms);
    std::printf("  \"heston_vec100_ms\": %.6f,\n", vec100_ms);
    std::printf("  \"heston_vec100_options_per_sec\": %.1f,\n", 100.0 * 1000.0 / vec100_ms);
    std::printf("  \"heston_vec512_ms\": %.6f,\n", vec512_ms);
    std::printf("  \"heston_vec512_options_per_sec\": %.1f,\n", 512.0 * 1000.0 / vec512_ms);
    std::printf("  \"heston_greeks_ms\": %.6f,\n", greeks_ms);
    std::printf("  \"heston_iv_ms\": %.6f,\n", iv_ms);
    std::printf("  \"sabr_single_us\": %.4f,\n", sabr_us);
    std::printf("  \"sabr_vec100_ms\": %.6f,\n", sabr100_ms);
    std::printf("  \"sabr_vols_per_sec\": %.1f,\n", 100.0 * 1000.0 / sabr100_ms);
    std::printf("  \"ou_simulate252_ms\": %.6f,\n", ou_sim_ms);
    std::printf("  \"ou_fit252_ms\": %.6f,\n", ou_fit_ms);
    std::printf("  \"ou_loglik252_us\": %.4f,\n", ou_ll_us);
#ifdef REF_BENCH_WITH_PDE
    std::printf("  \"bs_pde_solve_ms\": %.6f,\n", bs_pde_ms);
    std::printf("  \"heston_pde_solve_ms\": %.6f,\n", heston_pde_ms);
    std::printf("  \"heston_pde_amer_solve_ms\": %.6f,\n", heston_pde_am_ms);
    std::printf("  \"hjb_all_boundaries_ms\": %.6f,\n", hjb_ms);
#endif
    std::printf("  \"openmp_threads\": %d\n",
#ifdef _OPENMP
                 []{ int n = 0;
#pragma omp parallel
                     {
#pragma omp master
                         n = omp_get_num_threads();
                     }
                     return n; }()
#else
                 1
#endif
    );
    std::printf("}\n");
    return 0;
}

// ---------------------------------------------------------------------------
// ctypes shims for the measured-calibration driver (run_reference_bench.py):
// scipy differential_evolution + least_squares exactly as the reference
// calibrator (heston_calibrator.py:416-477), pricing through THIS engine.
// ---------------------------------------------------------------------------

extern "C" {

void ref_heston_price_options(const double* params5, const double* strikes,
                              const double* maturities, int n, double spot,
                              double rate, double dividend, int is_call,
                              double* out) {
    HestonParameters p(params5[0], params5[1], params5[2], params5[3], params5[4]);
    HestonModel model(p);
    std::vector<double> K(strikes, strikes + n), T(maturities, maturities + n);
    auto prices = model.price_options(K, T, spot, rate, dividend, is_call != 0);
    for (int i = 0; i < n; ++i) out[i] = prices[i];
}

// Hagan vols through the reference's own SABRModel (models/sabr.cpp), so
// run_reference_bench.py can drive the reference's scipy SLSQP smile fit
// (sabr_calibrator.py:316-333 semantics) against the real C++ evaluator —
// one vectorized call per objective evaluation, which is FASTER than the
// reference's own per-strike Python loop (:318-323), i.e. favourable to
// the reference baseline.
void ref_sabr_implied_vols(double beta, const double* strikes, int n,
                           double forward, double maturity, double alpha,
                           double rho, double nu, double* out) {
    SABRModel model(beta);
    std::vector<double> K(strikes, strikes + n);
    auto vols = model.implied_volatilities(K, forward, maturity, alpha, rho, nu);
    for (int i = 0; i < n; ++i) out[i] = vols[i];
}

}  // extern "C"
