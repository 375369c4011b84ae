// Native unit tests for the pde_host/pde_solvers C++ runtime.
//
// Role parity with the reference's GTest suites (tests/cpp/test_heston.cpp,
// test_sabr.cpp, test_ou_process.cpp, test_math_utils.cpp): analytic
// identities checked directly against the native implementations, no Python
// in the loop.  This image ships no GTest, so the harness is a minimal
// assert-style runner; build + run via `make test-cpp` (or the
// tests/test_native.py subprocess test).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {
int64_t aggregate_bars(const double*, const double*, const double*, int64_t,
                       double, double*, int64_t);
void run_position_backtest(const double*, const double*, int64_t, double,
                           double*, double*, double*);
void thomas_solve(const double*, const double*, const double*, const double*,
                  int64_t, int64_t, double*, double*);
void ou_mle(const double*, int64_t, double, double*);
void zscore_positions(const double*, int64_t, int64_t, double, double, double*);
void heston_price_batch(double, double, double, double, double, double, double,
                        double, const double*, const double*, const double*,
                        int64_t, int64_t, double, double, double*);
void sabr_vols(double, double, double, double, double, double, const double*,
               int64_t, double*);
double bs_pde_solve(double, double, double, double, double, double, int32_t,
                    int32_t, int64_t, int64_t, double, double, int32_t,
                    double*, double*);
double heston_adi_solve(double, double, double, double, double, double, double,
                        double, double, int32_t, int32_t, double, int64_t,
                        int64_t, int64_t, double, double, double, double*);
void hjb_march(double, double, double, double, double, double, double, int64_t,
               int64_t, const double*, double*);
int64_t simulate_fills(const double*, const double*, int64_t, const double*,
                       const double*, const double*, const double*,
                       const double*, const double*, int64_t, double, double,
                       double, double*);
int32_t pde_host_abi_version();
}

namespace {

int g_failures = 0;
int g_checks = 0;

void check(bool ok, const char* what) {
    ++g_checks;
    if (!ok) {
        ++g_failures;
        std::fprintf(stderr, "FAIL: %s\n", what);
    }
}

void check_near(double a, double b, double tol, const char* what) {
    ++g_checks;
    if (!(std::fabs(a - b) <= tol)) {
        ++g_failures;
        std::fprintf(stderr, "FAIL: %s  (%.12g vs %.12g, tol %.3g)\n", what, a,
                     b, tol);
    }
}

double norm_cdf(double x) { return 0.5 * std::erfc(-x / std::sqrt(2.0)); }

double bs_closed_form(double S, double K, double r, double q, double sigma,
                      double T, bool call) {
    const double d1 =
        (std::log(S / K) + (r - q + 0.5 * sigma * sigma) * T) /
        (sigma * std::sqrt(T));
    const double d2 = d1 - sigma * std::sqrt(T);
    if (call)
        return S * std::exp(-q * T) * norm_cdf(d1) -
               K * std::exp(-r * T) * norm_cdf(d2);
    return K * std::exp(-r * T) * norm_cdf(-d2) -
           S * std::exp(-q * T) * norm_cdf(-d1);
}

// --- tests ----------------------------------------------------------------

void test_abi() { check(pde_host_abi_version() == 3, "ABI version"); }

void test_aggregate_bars() {
    double t[] = {0.0, 1.0, 2.0, 60.0, 61.0, 125.0};
    double p[] = {10.0, 12.0, 9.0, 11.0, 11.5, 8.0};
    double s[] = {1.0, 2.0, 1.0, 3.0, 1.0, 2.0};
    double out[6 * 6];
    int64_t n = aggregate_bars(t, p, s, 6, 60.0, out, 6);
    check(n == 3, "bar count");
    check_near(out[0 * 6 + 1], 10.0, 0.0, "bar0 open");
    check_near(out[0 * 6 + 2], 12.0, 0.0, "bar0 high");
    check_near(out[0 * 6 + 3], 9.0, 0.0, "bar0 low");
    check_near(out[0 * 6 + 4], 9.0, 0.0, "bar0 close");
    check_near(out[0 * 6 + 5], 4.0, 0.0, "bar0 volume");
    check_near(out[1 * 6 + 5], 4.0, 0.0, "bar1 volume");
    check_near(out[2 * 6 + 1], 8.0, 0.0, "bar2 open");
}

void test_position_backtest() {
    // long 1 unit the whole way on a doubling path: total return = 1
    double prices[] = {1.0, 1.25, 1.6, 2.0};
    double pos[] = {1.0, 1.0, 1.0, 1.0};
    double ret[3], eq[4], stats[4];
    run_position_backtest(prices, pos, 4, 0.0, ret, eq, stats);
    check_near(eq[3], 2.0, 1e-12, "equity compounds to 2");
    check_near(stats[0], 1.0, 1e-12, "total return");
    check_near(stats[2], 0.0, 1e-12, "no drawdown on a rising path");
    // costs reduce returns
    run_position_backtest(prices, pos, 4, 0.01, ret, eq, stats);
    check(stats[0] < 1.0, "turnover cost reduces return");
}

void test_thomas() {
    // random diagonally dominant system; verify A x = b
    std::mt19937_64 gen(7);
    std::uniform_real_distribution<double> u(-1.0, 1.0);
    const int64_t n = 64, B = 3;
    std::vector<double> lo(B * (n - 1)), di(B * n), up(B * (n - 1)),
        rhs(B * n), x(B * n), work(2 * n);
    for (auto& v : lo) v = u(gen);
    for (auto& v : up) v = u(gen);
    for (auto& v : rhs) v = u(gen);
    for (auto& v : di) v = 4.0 + u(gen);
    thomas_solve(lo.data(), di.data(), up.data(), rhs.data(), n, B, x.data(),
                 work.data());
    double max_resid = 0.0;
    for (int64_t b = 0; b < B; ++b) {
        const double* l = lo.data() + b * (n - 1);
        const double* d = di.data() + b * n;
        const double* up_ = up.data() + b * (n - 1);
        const double* r = rhs.data() + b * n;
        const double* xb = x.data() + b * n;
        for (int64_t i = 0; i < n; ++i) {
            double ax = d[i] * xb[i];
            if (i > 0) ax += l[i - 1] * xb[i - 1];
            if (i < n - 1) ax += up_[i] * xb[i + 1];
            max_resid = std::max(max_resid, std::fabs(ax - r[i]));
        }
    }
    check(max_resid < 1e-12, "Thomas residual");
}

void test_ou_mle_recovery() {
    // exact-discretization simulation, then MLE recovery (the reference's
    // test_ou_process.cpp pattern)
    const double theta = 1.5, mu = 8.0, sigma = 0.5, dt = 1.0 / 252.0;
    const int64_t n = 200000;
    std::mt19937_64 gen(42);
    std::normal_distribution<double> z(0.0, 1.0);
    std::vector<double> x(n);
    x[0] = theta;
    const double b = std::exp(-mu * dt);
    const double sd = sigma * std::sqrt((1.0 - b * b) / (2.0 * mu));
    for (int64_t i = 1; i < n; ++i)
        x[i] = theta + b * (x[i - 1] - theta) + sd * z(gen);
    double out[3];
    ou_mle(x.data(), n, dt, out);
    check_near(out[0], theta, 0.05, "OU theta recovery");
    check_near(out[1], mu, 0.5, "OU mu recovery");
    check_near(out[2], sigma, 0.01, "OU sigma recovery");
}

void test_zscore_walk() {
    // constant series then a deep dip: walk must go long at the dip
    std::vector<double> p(40, 100.0);
    for (int64_t i = 30; i < 35; ++i) p[i] = 90.0;
    std::vector<double> pos(40);
    zscore_positions(p.data(), 40, 20, 1.5, 0.5, pos.data());
    check(pos[30] == 1.0, "entry long below -entry_z");
    bool exited = false;
    for (int64_t i = 35; i < 40; ++i) exited |= (pos[i] == 0.0);
    check(exited, "exit after reversion");
}

void test_heston_identities() {
    // put-call parity: C - P = S e^{-qT} - K e^{-rT} (test_heston.cpp:197)
    const double S0 = 100.0, r = 0.05, q = 0.02, T = 1.0;
    double K[] = {90.0, 100.0, 110.0};
    double Tm[] = {T, T, T};
    double calls[3], puts[3];
    double ic[] = {1.0, 1.0, 1.0}, ip[] = {0.0, 0.0, 0.0};
    heston_price_batch(2.0, 0.04, 0.3, -0.7, 0.04, S0, r, q, K, Tm, ic, 3,
                       1024, 0.01, 0.75, calls);
    heston_price_batch(2.0, 0.04, 0.3, -0.7, 0.04, S0, r, q, K, Tm, ip, 3,
                       1024, 0.01, 0.75, puts);
    for (int k = 0; k < 3; ++k) {
        const double lhs = calls[k] - puts[k];
        const double rhs =
            S0 * std::exp(-q * T) - K[k] * std::exp(-r * T);
        check_near(lhs, rhs, 5e-3, "Heston put-call parity");
    }
    // zero maturity = intrinsic (test_heston.cpp:216)
    double T0[] = {0.0};
    double k110[] = {110.0}, one[] = {1.0}, price[1];
    heston_price_batch(2.0, 0.04, 0.3, -0.7, 0.04, 120.0, r, q, k110, T0, one,
                       1, 1024, 0.01, 0.75, price);
    check_near(price[0], 10.0, 1e-12, "Heston T=0 intrinsic");
    // monotone in strike
    check(calls[0] > calls[1] && calls[1] > calls[2],
          "Heston call monotone in strike");
}

void test_sabr_identities() {
    // beta = 1, nu -> 0 degenerates to flat lognormal vol alpha
    double K[] = {80.0, 100.0, 125.0};
    double vols[3];
    sabr_vols(0.25, 1.0, 0.0, 1e-12, 100.0, 1.0, K, 3, vols);
    for (int k = 0; k < 3; ++k)
        check_near(vols[k], 0.25, 1e-9, "SABR flat limit (beta=1, nu=0)");
    // smile: negative rho skews OTM puts rich
    sabr_vols(0.25, 0.7, -0.4, 0.6, 100.0, 1.0, K, 3, vols);
    check(vols[0] > vols[1], "SABR negative-rho downside skew");
}

void test_bs_pde() {
    // European CN vs closed form (test_cpp_bindings.py:465 pattern)
    const double S0 = 105.0, K = 100.0, r = 0.05, q = 0.01, sigma = 0.25,
                 T = 1.0;
    double price = bs_pde_solve(S0, sigma, r, q, T, K, 1, 0, 400, 400, 0.2,
                                5.0, 1, nullptr, nullptr);
    check_near(price, bs_closed_form(S0, K, r, q, sigma, T, true), 2e-2,
               "BS-PDE European call vs closed form");
    // American put premium over European
    double amer = bs_pde_solve(95.0, 0.25, 0.05, 0.0, 1.0, 100.0, 0, 1, 200,
                               100, 0.2, 5.0, 1, nullptr, nullptr);
    double euro = bs_pde_solve(95.0, 0.25, 0.05, 0.0, 1.0, 100.0, 0, 0, 200,
                               100, 0.2, 5.0, 1, nullptr, nullptr);
    check(amer >= euro - 1e-12, "American put >= European");
    check(amer >= 5.0, "American put >= intrinsic");  // K - S0 = 5
}

void test_heston_adi() {
    // ADI price vs the true value for the canonical parameter set
    // (kappa=2, theta=0.04, sigma=0.3, rho=-0.7, v0=0.04, S=K=100, r=5%,
    // q=0, T=1), computed by adaptive quadrature of the Heston P1/P2
    // representation: 10.39421857.  The default 100x50x100 grid prices to
    // ~0.18% (see solvers/heston_adi.py docstring); assert 0.25%.
    const double truth = 10.39421857;
    double adi = heston_adi_solve(2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.0, 1.0,
                                  100.0, 1, 0, 100.0, 100, 50, 100, 0.2, 5.0,
                                  1.0, nullptr);
    check_near(adi, truth, 0.0025 * truth, "Heston ADI vs true price");
    // grid refinement tightens toward the truth
    double fine = heston_adi_solve(2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.0, 1.0,
                                   100.0, 1, 0, 100.0, 200, 100, 200, 0.2, 5.0,
                                   1.0, nullptr);
    check(std::fabs(fine - truth) < std::fabs(adi - truth),
          "ADI refinement converges");
    // American call on a non-dividend underlying = European call
    double amer = heston_adi_solve(2.0, 0.04, 0.3, -0.7, 0.04, 0.05, 0.0, 1.0,
                                   100.0, 1, 1, 100.0, 100, 50, 100, 0.2, 5.0,
                                   1.0, nullptr);
    check_near(amer, adi, 1e-3, "American call (q=0) = European");
}

void test_hjb() {
    // value function dominates the obstacle; deep deviations stop
    const int64_t n = 200;
    const double x_min = -0.5, x_max = 0.5;
    std::vector<double> g(n), V(n);
    for (int64_t i = 0; i < n; ++i) {
        const double x = x_min + (x_max - x_min) * double(i) / double(n - 1);
        g[i] = std::max(-x, 0.0) - 0.001;  // entry-long style payoff
    }
    hjb_march(0.0, 5.0, 0.1, 0.05, 1.0, x_min, x_max, n, 200, g.data(),
              V.data());
    bool dominates = true;
    for (int64_t i = 1; i < n - 1; ++i) dominates &= (V[i] >= g[i] - 1e-9);
    check(dominates, "HJB value dominates obstacle");
    check(V[n / 2] > 0.0, "continuation value positive at the mean");
}

void test_fill_engine() {
    // price dips to 98 at t=2: resting limit buy at 99 fills there, stop
    // sell at 98.5 triggers, market order fills immediately
    double tt[] = {0.0, 1.0, 2.0};
    double tp[] = {100.0, 101.0, 98.0};
    double submit[] = {0.0, 0.0, 0.0};
    double sides[] = {1.0, -1.0, 1.0};
    double types[] = {1.0, 2.0, 0.0};          // limit buy, stop sell, market buy
    double limits[] = {99.0, 0.0, 0.0};
    double stops[] = {0.0, 98.5, 0.0};
    double qty[] = {10.0, 10.0, 10.0};
    double out[12];
    int64_t n = simulate_fills(tt, tp, 3, submit, sides, types, limits, stops,
                               qty, 3, 0.0, 0.0, 1e6, out);
    check(n == 3, "all three orders fill");
    check_near(out[0 * 4 + 0], 2.0, 0.0, "limit buy fills at t=2");
    check_near(out[0 * 4 + 1], 98.0, 0.0, "limit buy fill price");
    check_near(out[1 * 4 + 0], 2.0, 0.0, "stop sell triggers at t=2");
    check_near(out[2 * 4 + 0], 0.0, 0.0, "market order fills immediately");
    check_near(out[2 * 4 + 2], 1.0, 0.0, "IBKR minimum commission");
    // slippage pushes buys up, sells down
    n = simulate_fills(tt, tp, 3, submit, sides, types, limits, stops, qty, 3,
                       0.001, 0.0, 1e6, out);
    check(out[2 * 4 + 1] > 100.0, "buy slippage above market");
    check(out[1 * 4 + 1] < 98.0, "sell slippage below market");
}

}  // namespace

int main() {
    test_abi();
    test_aggregate_bars();
    test_position_backtest();
    test_thomas();
    test_ou_mle_recovery();
    test_zscore_walk();
    test_heston_identities();
    test_sabr_identities();
    test_bs_pde();
    test_heston_adi();
    test_hjb();
    test_fill_engine();
    std::printf("pde_host_test: %d checks, %d failures\n", g_checks,
                g_failures);
    return g_failures == 0 ? 0 : 1;
}
