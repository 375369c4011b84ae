// Golden-value dumper: compiles against the READ-ONLY reference C++ sources
// (/root/reference/src/cpp) and prints a JSON of reference outputs used as
// parity fixtures by the pde_tpu test-suite.  This file links the reference,
// it does not copy it.  Build (see tests/golden/README.md):
//   g++ -O2 -std=c++17 -I/root/reference/src/cpp tests/golden/make_golden.cpp \
//       /root/reference/src/cpp/models/heston.cpp \
//       /root/reference/src/cpp/models/sabr.cpp \
//       /root/reference/src/cpp/models/ou_process.cpp -o /tmp/make_golden
//   /tmp/make_golden > tests/golden/reference_values.json
#include <cstdio>
#include <vector>

#include "models/heston.hpp"
#include "models/ou_process.hpp"
#include "models/sabr.hpp"

using namespace quant::models;

static void emit(const char* key, double value, bool last = false) {
    std::printf("  \"%s\": %.17g%s\n", key, value, last ? "" : ",");
}

int main() {
    std::printf("{\n");

    // ---- Heston: canonical params from the reference benchmarks ----
    HestonParameters hp;
    hp.kappa = 2.0; hp.theta = 0.04; hp.sigma = 0.3; hp.rho = -0.7; hp.v0 = 0.04;
    HestonModel heston(hp);

    emit("heston_call_atm_T1", heston.price_option(100.0, 1.0, 100.0, 0.05, 0.02, true));
    emit("heston_put_atm_T1", heston.price_option(100.0, 1.0, 100.0, 0.05, 0.02, false));
    emit("heston_call_k80_T025", heston.price_option(80.0, 0.25, 100.0, 0.05, 0.02, true));
    emit("heston_call_k120_T2", heston.price_option(120.0, 2.0, 100.0, 0.05, 0.02, true));
    emit("heston_call_k90_T05_q0", heston.price_option(90.0, 0.5, 100.0, 0.03, 0.0, true));
    emit("heston_iv_atm_T1", heston.implied_volatility(100.0, 1.0, 100.0, 0.05, 0.02, true));
    emit("heston_iv_k110_T05", heston.implied_volatility(110.0, 0.5, 100.0, 0.05, 0.02, true));

    {
        std::complex<double> phi = heston.characteristic_function(
            std::complex<double>(1.5, -1.75), 1.0, 100.0, 0.05, 0.02);
        emit("heston_cf_re", phi.real());
        emit("heston_cf_im", phi.imag());
    }

    // finite-difference Greeks (heston.cpp:169-218)
    {
        quant::models::PricingResult pr =
            heston.price_option_with_greeks(100.0, 1.0, 100.0, 0.05, 0.02, true);
        emit("heston_greek_delta", pr.greeks.delta);
        emit("heston_greek_gamma", pr.greeks.gamma);
        emit("heston_greek_vega", pr.greeks.vega);
        emit("heston_greek_theta", pr.greeks.theta);
        emit("heston_greek_rho", pr.greeks.rho);
    }

    // strike sweep at T = 1 (the 100-option vectorized benchmark config)
    {
        std::printf("  \"heston_strikes_T1\": [");
        for (int i = 0; i < 100; ++i) {
            double k = 80.0 + 40.0 * i / 99.0;
            double p = heston.price_option(k, 1.0, 100.0, 0.05, 0.02, true);
            std::printf("%.17g%s", p, i + 1 < 100 ? ", " : "");
        }
        std::printf("],\n");
    }

    // second parameter set (Feller-violating, stress case)
    HestonParameters hp2;
    hp2.kappa = 1.0; hp2.theta = 0.09; hp2.sigma = 0.9; hp2.rho = -0.5; hp2.v0 = 0.06;
    HestonModel heston2(hp2);
    emit("heston2_call_atm_T1", heston2.price_option(100.0, 1.0, 100.0, 0.05, 0.02, true));
    emit("heston2_call_k70_T3", heston2.price_option(70.0, 3.0, 100.0, 0.05, 0.02, true));

    // ---- SABR ----
    SABRModel sabr(0.5);
    emit("sabr_vol_k105", sabr.implied_volatility(105.0, 100.0, 1.0, 0.2, -0.3, 0.4));
    emit("sabr_vol_k80", sabr.implied_volatility(80.0, 100.0, 1.0, 0.2, -0.3, 0.4));
    emit("sabr_vol_atm", sabr.implied_volatility(100.0, 100.0, 1.0, 0.2, -0.3, 0.4));
    emit("sabr_vol_k120_T025", sabr.implied_volatility(120.0, 100.0, 0.25, 0.3, 0.2, 0.6));
    emit("sabr_atm_formula", sabr.atm_volatility(100.0, 1.0, 0.2, -0.3, 0.4));
    SABRModel sabr_b1(1.0);
    emit("sabr_b1_vol_k110", sabr_b1.implied_volatility(110.0, 100.0, 0.5, 0.25, -0.4, 0.5));
    SABRModel sabr_b0(0.0);
    emit("sabr_b0_vol_k95", sabr_b0.implied_volatility(95.0, 100.0, 2.0, 15.0, 0.1, 0.3));

    // SABR FD sensitivities (sabr.cpp:250-280)
    {
        auto [da, dr, dn] = sabr.volatility_sensitivities(105.0, 100.0, 1.0, 0.2, -0.3, 0.4);
        emit("sabr_sens_dalpha", da);
        emit("sabr_sens_drho", dr);
        emit("sabr_sens_dnu", dn);
    }

    // ---- OU: fit on a deterministic simulated path ----
    OUParameters op;
    op.theta = 100.0; op.mu = 5.0; op.sigma = 2.0;
    std::vector<double> path = OUProcess::simulate(op, 100.0, 1.0, 252, 42);
    emit("ou_path_last", path.back());

    // full path so the JAX tests can fit the exact same series
    std::printf("  \"ou_path\": [");
    for (size_t i = 0; i < path.size(); ++i) {
        std::printf("%.17g%s", path[i], i + 1 < path.size() ? ", " : "");
    }
    std::printf("],\n");

    OUFitResult fit = OUProcess::fit_mle(path, 1.0 / 252.0);
    emit("ou_fit_theta", fit.params.theta);
    emit("ou_fit_mu", fit.params.mu);
    emit("ou_fit_sigma", fit.params.sigma);
    emit("ou_fit_ll", fit.log_likelihood);
    emit("ou_fit_aic", fit.aic);
    emit("ou_fit_bic", fit.bic);

    emit("ou_ll_true_params", OUProcess::log_likelihood(path, op, 1.0 / 252.0));
    emit("ou_cond_mean", OUProcess::conditional_mean(103.0, op, 1.0 / 252.0));
    emit("ou_cond_var", OUProcess::conditional_variance(op, 1.0 / 252.0));
    emit("ou_trans_dens", OUProcess::transition_density(100.5, 103.0, op, 1.0 / 252.0));

    {
        auto [lo, hi, ex] = OUProcess::optimal_boundaries(op, 0.001, 0.05);
        emit("ou_bound_lower", lo);
        emit("ou_bound_upper", hi);
        emit("ou_bound_exit", ex, true);
    }

    std::printf("}\n");
    return 0;
}
