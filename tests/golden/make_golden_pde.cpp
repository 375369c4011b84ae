// Golden-value dumper for the reference PDE solvers: compiles against the
// READ-ONLY reference C++ headers (/root/reference/src/cpp/solvers — they are
// header-only) plus the Eigen bundled with this image's tensorflow wheel.
// This file links the reference, it does not copy it.  Build:
//
//   EIG=/opt/venv/lib/python3.12/site-packages/tensorflow/include
//   g++ -O2 -std=c++17 -include tuple -I/root/reference/src/cpp -I$EIG \
//       tests/golden/make_golden_pde.cpp \
//       /root/reference/src/cpp/models/heston.cpp \
//       /root/reference/src/cpp/models/ou_process.cpp \
//       /root/reference/src/cpp/models/sabr.cpp \
//       /root/reference/src/cpp/core/math_utils.cpp -o /tmp/make_golden_pde
//   /tmp/make_golden_pde > tests/golden/reference_pde_values.json
//
// Captured solvers (reference locations):
//   BlackScholesPDESolver  src/cpp/solvers/black_scholes_pde.hpp:84
//   HestonPDESolver        src/cpp/solvers/heston_pde.hpp:103 (Craig-Sneyd ADI)
//   HJBSolver              src/cpp/solvers/hjb_solver.hpp:140
#include <chrono>
#include <cstdio>

#include "solvers/black_scholes_pde.hpp"
#include "solvers/heston_pde.hpp"
#include "solvers/hjb_solver.hpp"

using namespace quant::solvers;

static bool g_first = true;
static void emit(const char* key, double value) {
    std::printf("%s  \"%s\": %.17g", g_first ? "" : ",\n", key, value);
    g_first = false;
}

static double now_ms() {
    using clk = std::chrono::steady_clock;
    return std::chrono::duration<double, std::milli>(
               clk::now().time_since_epoch())
        .count();
}

int main() {
    std::printf("{\n");

    // ---- Black-Scholes PDE (defaults: 200x100, CN, log-space grid) ----
    {
        BlackScholesPDEParams p;  // sigma .2, r .05, q 0, T 1, K 100, call
        p.q = 0.02;
        BlackScholesPDESolver solver(p);
        auto r = solver.solve(100.0);
        emit("bs_pde_euro_call_price", r.price);
        emit("bs_pde_euro_call_delta", r.delta);
        emit("bs_pde_euro_call_gamma", r.gamma);
        emit("bs_pde_euro_call_theta", r.theta);

        p.option_type = OptionType::Put;
        auto rp = BlackScholesPDESolver(p).solve(100.0);
        emit("bs_pde_euro_put_price", rp.price);

        p.exercise = ExerciseStyle::American;
        p.r = 0.08;  // high carry makes early exercise bite
        auto ra = BlackScholesPDESolver(p).solve(100.0);
        emit("bs_pde_amer_put_price", ra.price);
        emit("bs_pde_amer_put_early", ra.early_exercise_optimal ? 1.0 : 0.0);

        // off-strike spots through the same grid interpolation
        p.exercise = ExerciseStyle::European;
        p.r = 0.05;
        BlackScholesPDESolver s2(p);
        emit("bs_pde_euro_put_S90", s2.solve(90.0).price);
        emit("bs_pde_euro_put_S115", s2.solve(115.0).price);
    }

    // ---- Heston PDE, Craig-Sneyd ADI (defaults: 100x50x100) ----
    {
        HestonPDEParams p;  // canonical kappa 2, theta .04, sigma .3, rho -.7,
                            // v0 .04, r .05, q 0, T 1, K 100 (heston_pde.hpp:56)
        double t0 = now_ms();
        auto r = HestonPDESolver(p).solve(100.0);
        double t1 = now_ms();
        emit("heston_pde_euro_call_price", r.price);
        emit("heston_pde_euro_call_delta", r.delta);
        emit("heston_pde_euro_call_gamma", r.gamma);
        emit("heston_pde_euro_call_vega", r.vega);
        emit("heston_pde_solve_ms", t1 - t0);

        p.option_type = OptionType::Put;
        auto rp = HestonPDESolver(p).solve(100.0);
        emit("heston_pde_euro_put_price", rp.price);

        p.exercise = ExerciseStyle::American;
        auto ra = HestonPDESolver(p).solve(100.0);
        emit("heston_pde_amer_put_price", ra.price);

        // second parameter set: higher vol-of-vol, shorter maturity, OTM call
        HestonPDEParams p2;
        p2.kappa = 1.5; p2.theta = 0.09; p2.sigma = 0.5; p2.rho = -0.5;
        p2.v0 = 0.06; p2.r = 0.03; p2.q = 0.01; p2.T = 0.5; p2.K = 110.0;
        emit("heston_pde2_euro_call_price", HestonPDESolver(p2).solve(100.0).price);
    }

    // ---- HJB optimal stopping (defaults: 200x200 on [-0.5, 0.5]) ----
    {
        HJBParams p;  // theta 0, mu 5, sigma .1, r .05, costs 1e-3, T 1
        double t0 = now_ms();
        auto b = HJBSolver(p).solve_all_boundaries();
        double t1 = now_ms();
        emit("hjb_entry_long", b.entry_long);
        emit("hjb_entry_short", b.entry_short);
        emit("hjb_exit_long", b.exit_long);
        emit("hjb_exit_short", b.exit_short);
        emit("hjb_stop_loss_long", b.stop_loss_long);
        emit("hjb_stop_loss_short", b.stop_loss_short);
        emit("hjb_all_boundaries_ms", t1 - t0);

        // single-problem value function probe (EntryLong default)
        auto res = HJBSolver(p).solve();
        emit("hjb_entry_long_value_at_0", res.value_at(0.0));
        emit("hjb_entry_long_value_at_m02", res.value_at(-0.2));

        // slower mean reversion + higher costs (Leung-Li-style config)
        HJBParams p3; p3.mu = 2.0; p3.sigma = 0.15;
        p3.c_entry = 0.005; p3.c_exit = 0.005;
        auto b3 = HJBSolver(p3).solve_all_boundaries();
        emit("hjb2_entry_long", b3.entry_long);
        emit("hjb2_entry_short", b3.entry_short);
    }

    std::printf("\n}\n");
    return 0;
}
