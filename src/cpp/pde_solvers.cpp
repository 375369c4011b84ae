// pde_solvers: native float64 PDE-solver oracles for pde_tpu.
//
// Independent C++ implementations of the three finite-difference schemes the
// JAX solver stack runs on device (solvers/bs_pde.py, solvers/heston_adi.py,
// solvers/hjb.py) — the role the reference's C++ solver layer plays
// (src/cpp/solvers/black_scholes_pde.hpp, heston_pde.hpp, hjb_solver.hpp).
// The test-suite cross-checks every JAX march against these, so a regression
// in either implementation (or a discretization drift between them) fails
// loudly.  Same schemes, independent code: log-space Crank-Nicolson for
// Black-Scholes, Douglas ADI with In 't Hout-Foulon boundaries for Heston,
// implicit-Euler obstacle projection for the HJB stopping problems.
//
// Plain C ABI (ctypes; see pde_tpu/native/loader.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// In-place Thomas solve; lower[i-1] couples row i to row i-1.
void thomas(const double* lower, const double* diag, const double* upper,
            const double* rhs, int64_t n, double* x, double* cp, double* dp) {
    cp[0] = upper[0] / diag[0];
    dp[0] = rhs[0] / diag[0];
    for (int64_t i = 1; i < n; ++i) {
        double m = diag[i] - lower[i - 1] * cp[i - 1];
        cp[i] = (i < n - 1) ? upper[i] / m : 0.0;
        dp[i] = (rhs[i] - lower[i - 1] * dp[i - 1]) / m;
    }
    x[n - 1] = dp[n - 1];
    for (int64_t i = n - 2; i >= 0; --i) x[i] = dp[i] - cp[i] * x[i + 1];
}

double interp_linear(const double* xs, const double* ys, int64_t n, double x) {
    if (x <= xs[0]) return ys[0];
    if (x >= xs[n - 1]) return ys[n - 1];
    int64_t i = int64_t(std::lower_bound(xs, xs + n, x) - xs);
    if (i == 0) i = 1;
    double t = (x - xs[i - 1]) / (xs[i] - xs[i - 1]);
    return ys[i - 1] + t * (ys[i] - ys[i - 1]);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Black-Scholes 1D PDE (log-space Crank-Nicolson / implicit), float64 oracle
// of pde_tpu.solvers.bs_pde.solve.  Writes V(t=0) on the grid into out_grid
// (n_space), the spot grid into out_sgrid (n_space), and returns the price
// interpolated at S0.
double bs_pde_solve(double S0, double sigma, double r, double q, double T,
                    double K, int32_t is_call, int32_t american,
                    int64_t n_space, int64_t n_time,
                    double s_min_mult, double s_max_mult, int32_t crank_nicolson,
                    double* out_grid, double* out_sgrid) {
    const int64_t n = n_space;
    std::vector<double> x(n), s(n), V(n), payoff(n), rhs(n);
    std::vector<double> lower(n - 1), diag(n), upper(n - 1), cp(n), dpv(n);

    const double x0 = std::log(K * s_min_mult), x1 = std::log(K * s_max_mult);
    const double dx = (x1 - x0) / double(n - 1);
    for (int64_t i = 0; i < n; ++i) {
        x[i] = x0 + dx * double(i);
        s[i] = std::exp(x[i]);
        payoff[i] = is_call ? std::max(s[i] - K, 0.0) : std::max(K - s[i], 0.0);
        V[i] = payoff[i];
    }
    const double dt = T / double(n_time);
    const double sigma2 = sigma * sigma;
    const double drift = r - q - 0.5 * sigma2;
    const double a = 0.5 * sigma2 / (dx * dx);
    const double b = drift / (2.0 * dx);
    const double L_m = a - b, L_c = -2.0 * a - r, L_p = a + b;
    const double w = crank_nicolson ? 0.5 : 1.0;

    for (int64_t i = 0; i < n; ++i) diag[i] = (i > 0 && i < n - 1) ? 1.0 - w * dt * L_c : 1.0;
    for (int64_t i = 0; i + 1 < n; ++i) {
        lower[i] = (i + 1 < n - 1) ? -w * dt * L_m : 0.0;  // row i+1 interior?
        upper[i] = (i > 0) ? -w * dt * L_p : 0.0;          // row i interior?
    }

    for (int64_t step = 0; step < n_time; ++step) {
        // after this step the grid sits at time-to-expiry tau.  (The
        // reference discounts over calendar time instead —
        // black_scholes_pde.hpp:127 — a non-converging boundary error the
        // JAX solver and this oracle both correct; see solvers/bs_pde.py.)
        const double tau = dt * double(step + 1);
        // rhs = V (+ CN explicit half-step on interior)
        std::memcpy(rhs.data(), V.data(), size_t(n) * sizeof(double));
        if (crank_nicolson) {
            for (int64_t i = 1; i < n - 1; ++i)
                rhs[i] += 0.5 * dt * (L_m * V[i - 1] + L_c * V[i] + L_p * V[i + 1]);
        }
        thomas(lower.data(), diag.data(), upper.data(), rhs.data(), n, V.data(),
               cp.data(), dpv.data());
        const double df_r = std::exp(-r * tau);
        const double df_q = std::exp(-q * tau);
        if (is_call) {
            V[0] = 0.0;
            V[n - 1] = s[n - 1] * df_q - K * df_r;
        } else {
            V[0] = K * df_r - s[0] * df_q;
            V[n - 1] = 0.0;
        }
        if (american)
            for (int64_t i = 0; i < n; ++i) V[i] = std::max(V[i], payoff[i]);
    }
    if (out_grid) std::memcpy(out_grid, V.data(), size_t(n) * sizeof(double));
    if (out_sgrid) std::memcpy(out_sgrid, s.data(), size_t(n) * sizeof(double));
    return interp_linear(s.data(), V.data(), n, S0);
}

// ---------------------------------------------------------------------------
// Heston 2D PDE — Douglas ADI (theta = 1/2), log-spot grid, In 't Hout-Foulon
// boundaries; float64 oracle of pde_tpu.solvers.heston_adi.solve.
// V is row-major (nS, nv).  Returns the bilinear price at (S0, v0); the full
// t=0 grid goes to out_grid (nS*nv) if non-null.
double heston_adi_solve(double kappa, double theta, double sigma, double rho,
                        double v0, double r, double q, double T, double K,
                        int32_t is_call, int32_t american, double S0,
                        int64_t n_spot, int64_t n_vol, int64_t n_time,
                        double s_min_mult, double s_max_mult, double v_max,
                        double* out_grid) {
    const int64_t nS = n_spot, nv = n_vol;
    const double x0 = std::log(K * s_min_mult), x1 = std::log(K * s_max_mult);
    const double dx = (x1 - x0) / double(nS - 1);
    const double dv = v_max / double(nv - 1);
    const double dt = T / double(n_time);
    const double th = 0.5;  // Douglas parameter

    std::vector<double> s(nS), v(nv);
    for (int64_t i = 0; i < nS; ++i) s[i] = std::exp(x0 + dx * double(i));
    for (int64_t j = 0; j < nv; ++j) v[j] = dv * double(j);

    auto at = [nv](int64_t i, int64_t j) { return i * nv + j; };

    std::vector<double> payoff(nS * nv), V(nS * nv);
    for (int64_t i = 0; i < nS; ++i) {
        const double p =
            is_call ? std::max(s[i] - K, 0.0) : std::max(K - s[i], 0.0);
        for (int64_t j = 0; j < nv; ++j) payoff[at(i, j)] = p;
    }
    V = payoff;

    // A1 (S direction) interior coefficients per v level
    std::vector<double> a1_lo(nv), a1_di(nv), a1_up(nv);
    for (int64_t j = 0; j < nv; ++j) {
        const double aj = 0.5 * v[j] / (dx * dx);
        const double bj = (r - q - 0.5 * v[j]) / (2.0 * dx);
        a1_lo[j] = aj - bj;
        a1_di[j] = -2.0 * aj - 0.5 * r;
        a1_up[j] = aj + bj;
    }
    // A2 (v direction) dense diagonals, same for every S row
    std::vector<double> a2_lo(nv - 1, 0.0), a2_di(nv, 0.0), a2_up(nv - 1, 0.0);
    for (int64_t j = 1; j < nv - 1; ++j) {
        const double d = 0.5 * sigma * sigma * v[j] / (dv * dv);
        const double adv = kappa * (theta - v[j]) / (2.0 * dv);
        a2_lo[j - 1] = d - adv;
        a2_di[j] = -2.0 * d - 0.5 * r;
        a2_up[j] = d + adv;
    }
    {   // v = 0: one-sided convection row (diffusion vanishes)
        const double c = kappa * theta / dv;
        a2_di[0] = -c - 0.5 * r;
        a2_up[0] = c;
    }   // v = v_max: Dirichlet (zero row)

    auto apply_a1 = [&](const std::vector<double>& U, std::vector<double>& out) {
        for (int64_t j = 0; j < nv; ++j)
            for (int64_t i = 0; i < nS; ++i) {
                double acc = 0.0;
                if (i > 0 && i < nS - 1)
                    acc = a1_lo[j] * U[at(i - 1, j)] + a1_di[j] * U[at(i, j)] +
                          a1_up[j] * U[at(i + 1, j)];
                out[at(i, j)] = acc;
            }
    };
    auto apply_a2 = [&](const std::vector<double>& U, std::vector<double>& out) {
        for (int64_t i = 0; i < nS; ++i)
            for (int64_t j = 0; j < nv; ++j) {
                double acc = a2_di[j] * U[at(i, j)];
                if (j > 0) acc += a2_lo[j - 1] * U[at(i, j - 1)];
                if (j < nv - 1) acc += a2_up[j] * U[at(i, j + 1)];
                out[at(i, j)] = acc;
            }
    };
    auto apply_a0 = [&](const std::vector<double>& U, std::vector<double>& out) {
        std::fill(out.begin(), out.end(), 0.0);
        const double f = rho * sigma / (4.0 * dx * dv);
        for (int64_t i = 1; i < nS - 1; ++i)
            for (int64_t j = 1; j < nv - 1; ++j)
                out[at(i, j)] = f * v[j] *
                    (U[at(i + 1, j + 1)] - U[at(i + 1, j - 1)] -
                     U[at(i - 1, j + 1)] + U[at(i - 1, j - 1)]);
    };

    // implicit sweep diagonals
    std::vector<double> i1_lo(nS - 1), i1_di(nS), i1_up(nS - 1);
    std::vector<double> i2_lo(nv - 1), i2_di(nv), i2_up(nv - 1);
    for (int64_t j = 0; j + 1 < nv; ++j) i2_lo[j] = -th * dt * a2_lo[j];
    for (int64_t j = 0; j < nv; ++j) i2_di[j] = 1.0 - th * dt * a2_di[j];
    for (int64_t j = 0; j + 1 < nv; ++j) i2_up[j] = -th * dt * a2_up[j];

    std::vector<double> F(nS * nv), A1V(nS * nv), A2V(nS * nv), A0V(nS * nv);
    std::vector<double> rhs(std::max(nS, nv)), sol(std::max(nS, nv));
    std::vector<double> cp(std::max(nS, nv)), dp(std::max(nS, nv));
    std::vector<double> Y(nS * nv);

    for (int64_t stepk = 1; stepk <= n_time; ++stepk) {
        apply_a0(V, A0V);
        apply_a1(V, A1V);
        apply_a2(V, A2V);

        // Y0 = V + dt (A0 + A1 + A2) V
        for (int64_t k = 0; k < nS * nv; ++k)
            Y[k] = V[k] + dt * (A0V[k] + A1V[k] + A2V[k]);

        // implicit S sweep per v level: (I - th dt A1) Y1 = Y0 - th dt A1 V
        for (int64_t j = 0; j < nv; ++j) {
            for (int64_t i = 0; i < nS; ++i) {
                const bool interior = (i > 0 && i < nS - 1);
                i1_di[i] = interior ? 1.0 - th * dt * a1_di[j] : 1.0;
                rhs[i] = Y[at(i, j)] - th * dt * A1V[at(i, j)];
            }
            for (int64_t i = 0; i + 1 < nS; ++i) {
                i1_lo[i] = (i + 1 < nS - 1) ? -th * dt * a1_lo[j] : 0.0;
                i1_up[i] = (i > 0) ? -th * dt * a1_up[j] : 0.0;
            }
            thomas(i1_lo.data(), i1_di.data(), i1_up.data(), rhs.data(), nS,
                   sol.data(), cp.data(), dp.data());
            for (int64_t i = 0; i < nS; ++i) Y[at(i, j)] = sol[i];
        }

        // implicit v sweep per S row: (I - th dt A2) Y2 = Y1 - th dt A2 V
        for (int64_t i = 0; i < nS; ++i) {
            for (int64_t j = 0; j < nv; ++j)
                rhs[j] = Y[at(i, j)] - th * dt * A2V[at(i, j)];
            thomas(i2_lo.data(), i2_di.data(), i2_up.data(), rhs.data(), nv,
                   sol.data(), cp.data(), dp.data());
            for (int64_t j = 0; j < nv; ++j) V[at(i, j)] = sol[j];
        }

        // Dirichlet boundaries at tau = stepk * dt (v = 0 stays a PDE row)
        const double tau = dt * double(stepk);
        const double df_r = std::exp(-r * tau), df_q = std::exp(-q * tau);
        for (int64_t j = 0; j < nv; ++j) {
            V[at(0, j)] = is_call ? 0.0 : K * df_r - s[0] * df_q;
            V[at(nS - 1, j)] = is_call ? s[nS - 1] * df_q - K * df_r : 0.0;
        }
        for (int64_t i = 0; i < nS; ++i)
            V[at(i, nv - 1)] = is_call ? s[i] * df_q : K * df_r;

        if (american)
            for (int64_t k = 0; k < nS * nv; ++k) V[k] = std::max(V[k], payoff[k]);
    }

    if (out_grid) std::memcpy(out_grid, V.data(), size_t(nS * nv) * sizeof(double));

    // bilinear interpolation at (S0, v0)
    int64_t i = int64_t(std::lower_bound(s.begin(), s.end(), S0) - s.begin());
    i = std::min(std::max(i, int64_t(1)), nS - 1);
    int64_t j = std::min(std::max(int64_t(std::floor(v0 / dv)) + 1, int64_t(1)),
                         nv - 1);
    const double tx = (S0 - s[i - 1]) / (s[i] - s[i - 1]);
    const double ty = (v0 - v[j - 1]) / dv;
    const double v00 = V[at(i - 1, j - 1)], v10 = V[at(i, j - 1)];
    const double v01 = V[at(i - 1, j)], v11 = V[at(i, j)];
    return (1 - tx) * (1 - ty) * v00 + tx * (1 - ty) * v10 +
           (1 - tx) * ty * v01 + tx * ty * v11;
}

// ---------------------------------------------------------------------------
// HJB optimal-stopping march: implicit Euler on the OU generator (central
// differences) + per-step obstacle projection + linear-extrapolation
// boundaries; float64 oracle of pde_tpu.solvers.hjb._march (projection mode).
// exercise: n_space obstacle values; out_V: final value function.
void hjb_march(double theta, double mu, double sigma, double r, double T,
               double x_min, double x_max, int64_t n_space, int64_t n_time,
               const double* exercise, double* out_V) {
    const int64_t n = n_space;
    const double dx = (x_max - x_min) / double(n - 1);
    const double dt = T / double(n_time);
    const double a = 0.5 * sigma * sigma / (dx * dx);

    std::vector<double> lower(n - 1, 0.0), diag(n, 1.0), upper(n - 1, 0.0);
    for (int64_t i = 1; i < n - 1; ++i) {
        const double xi = x_min + dx * double(i);
        const double drift = mu * (theta - xi);
        const double b = drift / (2.0 * dx);
        const double L_m = a - b, L_c = -2.0 * a - r, L_p = a + b;
        diag[i] = 1.0 - dt * L_c;
        lower[i - 1] = -dt * L_m;
        upper[i] = -dt * L_p;
    }
    // boundary coupling rows are identity
    lower[n - 2] = 0.0;
    upper[0] = 0.0;

    // time-independent operator: Thomas-factorize once, keep reciprocals so
    // the per-step serial chains avoid division latency
    std::vector<double> cp(n), inv_m(n);
    cp[0] = upper[0] / diag[0];
    inv_m[0] = 1.0 / diag[0];
    for (int64_t i = 1; i < n; ++i) {
        const double mi = diag[i] - lower[i - 1] * cp[i - 1];
        cp[i] = (i < n - 1) ? upper[i] / mi : 0.0;
        inv_m[i] = 1.0 / mi;
    }

    std::vector<double> V(exercise, exercise + n), dp(n);
    for (int64_t stepk = 0; stepk < n_time; ++stepk) {
        dp[0] = V[0] * inv_m[0];
        for (int64_t i = 1; i < n; ++i)
            dp[i] = (V[i] - lower[i - 1] * dp[i - 1]) * inv_m[i];
        V[n - 1] = std::max(dp[n - 1], exercise[n - 1]);
        for (int64_t i = n - 2; i >= 0; --i) {
            dp[i] -= cp[i] * dp[i + 1];
            V[i] = std::max(dp[i], exercise[i]);
        }
        V[0] = 2.0 * V[1] - V[2];
        V[n - 1] = 2.0 * V[n - 2] - V[n - 3];
    }
    std::memcpy(out_V, V.data(), size_t(n) * sizeof(double));
}

// Brennan-Schwartz variant: the rigorous LCP at each implicit step solved
// EXACTLY in one projected tridiagonal pass (valid because every stopping
// region here is anchored at one grid end; see solvers/lcp.py
// brennan_schwartz).  reverse=0: contact at the LEFT end (entry-long /
// exit-short); reverse=1: contact at the RIGHT end.  Host twin of
// pde_tpu.solvers.hjb._march(method="brennan_schwartz") — the latency
// backend for tiny single-pair solves (the serial chain is CPU-shaped;
// books of pairs go to the device via hjb.boundaries_batch).
void hjb_march_bs(double theta, double mu, double sigma, double r, double T,
                  double x_min, double x_max, int64_t n_space, int64_t n_time,
                  const double* exercise, int32_t reverse, double* out_V) {
    const int64_t n = n_space;
    const double dx = (x_max - x_min) / double(n - 1);
    const double dt = T / double(n_time);
    const double a = 0.5 * sigma * sigma / (dx * dx);

    // monotone upwind differencing, matching hjb._march's psor/brennan_schwartz
    // branch: Brennan-Schwartz is exact only for an M-matrix, which central
    // advection violates once |drift| dx > sigma^2
    std::vector<double> lower(n - 1, 0.0), diag(n, 1.0), upper(n - 1, 0.0);
    for (int64_t i = 1; i < n - 1; ++i) {
        const double xi = x_min + dx * double(i);
        const double drift = mu * (theta - xi);
        const double L_m = a + std::max(-drift, 0.0) / dx;
        const double L_p = a + std::max(drift, 0.0) / dx;
        const double L_c = -2.0 * a - std::abs(drift) / dx - r;
        diag[i] = 1.0 - dt * L_c;
        lower[i - 1] = -dt * L_m;
        upper[i] = -dt * L_p;
    }
    lower[n - 2] = 0.0;
    upper[0] = 0.0;

    // orient so the contact end is at index 0
    std::vector<double> lo(n - 1), up(n - 1), di(n), gg(n);
    for (int64_t i = 0; i < n; ++i) {
        di[i] = reverse ? diag[n - 1 - i] : diag[i];
        gg[i] = reverse ? exercise[n - 1 - i] : exercise[i];
    }
    for (int64_t i = 0; i < n - 1; ++i) {
        lo[i] = reverse ? upper[n - 2 - i] : lower[i];
        up[i] = reverse ? lower[n - 2 - i] : upper[i];
    }

    // the operator is time-independent: factorize ONCE (eliminate the
    // super-diagonal from the far end), and keep reciprocals so the per-step
    // serial chains are mul/fma-only — divisions would triple their latency
    std::vector<double> m(n, 0.0), inv_dt(n);
    {
        std::vector<double> dt_(n);
        dt_[n - 1] = di[n - 1];
        for (int64_t i = n - 2; i >= 0; --i) {
            m[i] = up[i] / dt_[i + 1];
            dt_[i] = di[i] - m[i] * lo[i];
        }
        for (int64_t i = 0; i < n; ++i) inv_dt[i] = 1.0 / dt_[i];
    }

    std::vector<double> V(gg), bt(n);
    for (int64_t stepk = 0; stepk < n_time; ++stepk) {
        bt[n - 1] = V[n - 1];
        for (int64_t i = n - 2; i >= 0; --i) bt[i] = V[i] - m[i] * bt[i + 1];
        // projected forward substitution into the contact end
        V[0] = std::max(bt[0] * inv_dt[0], gg[0]);
        for (int64_t i = 1; i < n; ++i) {
            V[i] = std::max((bt[i] - lo[i - 1] * V[i - 1]) * inv_dt[i], gg[i]);
        }
        // linear-extrapolation boundary rows (grid order!)
        if (reverse) {
            V[n - 1] = 2.0 * V[n - 2] - V[n - 3];  // x_min row in flipped order
            V[0] = 2.0 * V[1] - V[2];
        } else {
            V[0] = 2.0 * V[1] - V[2];
            V[n - 1] = 2.0 * V[n - 2] - V[n - 3];
        }
    }
    if (reverse) {
        for (int64_t i = 0; i < n; ++i) out_V[i] = V[n - 1 - i];
    } else {
        std::memcpy(out_V, V.data(), size_t(n) * sizeof(double));
    }
}

// All four stopping problems in one call, one std::thread per march — the
// host-side analog of hjb.solve_all_boundaries' batched device launch.
// exercise/out_V: (n_problems, n_space) row-major; reverse: per-problem flag.
void hjb_march_bs_multi(double theta, double mu, double sigma, double r,
                        double T, double x_min, double x_max, int64_t n_space,
                        int64_t n_time, int64_t n_problems,
                        const double* exercise, const int32_t* reverse,
                        double* out_V) {
    if (std::thread::hardware_concurrency() <= 1 || n_problems == 1) {
        for (int64_t k = 0; k < n_problems; ++k)
            hjb_march_bs(theta, mu, sigma, r, T, x_min, x_max, n_space, n_time,
                         exercise + k * n_space, reverse[k],
                         out_V + k * n_space);
        return;
    }
    std::vector<std::thread> workers;
    workers.reserve(size_t(n_problems));
    for (int64_t k = 0; k < n_problems; ++k) {
        workers.emplace_back([=] {
            hjb_march_bs(theta, mu, sigma, r, T, x_min, x_max, n_space, n_time,
                         exercise + k * n_space, reverse[k],
                         out_V + k * n_space);
        });
    }
    for (auto& w : workers) w.join();
}

}  // extern "C"
