"""Native host runtime (C++ via ctypes): stream aggregation, backtest loop,
float64 oracles.

Role parity with the reference's src/cpp layer: the device math is JAX, but
the latency-critical host paths are native.  numpy-facing wrappers here;
the C ABI and build live in pde_tpu/native/loader.py + src/cpp/pde_host.cpp.
"""

from __future__ import annotations

import ctypes
from typing import Dict, Tuple

import numpy as np

from .loader import NativeUnavailable, build, is_available, load

__all__ = [
    "is_available",
    "build",
    "NativeUnavailable",
    "aggregate_bars",
    "run_position_backtest",
    "thomas_solve",
    "ou_mle",
    "zscore_positions",
    "heston_price_batch",
    "sabr_vols",
    "bs_pde_solve",
    "heston_adi_solve",
    "hjb_march",
    "hjb_march_bs",
    "hjb_march_bs_multi",
    "simulate_fills",
    "bs_implied_vol",
]


def _c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def aggregate_bars(times, prices, sizes, bar_seconds: float) -> np.ndarray:
    """Ticks -> (n_bars, 6) [start, open, high, low, close, volume]."""
    lib = load()
    times = np.ascontiguousarray(times, dtype=np.float64)
    prices = np.ascontiguousarray(prices, dtype=np.float64)
    sizes = np.ascontiguousarray(sizes, dtype=np.float64)
    n = len(times)
    out = np.zeros((n, 6), dtype=np.float64)  # upper bound: one bar per tick
    n_bars = lib.aggregate_bars(_c(times), _c(prices), _c(sizes), n, bar_seconds, _c(out), n)
    return out[:n_bars].copy()


def run_position_backtest(prices, positions, cost_per_turnover: float = 0.0) -> Dict:
    """Native twin of backtest.vectorized.equity_from_positions + stats."""
    lib = load()
    prices = np.ascontiguousarray(prices, dtype=np.float64)
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    n = len(prices)
    returns = np.zeros(n - 1, dtype=np.float64)
    equity = np.zeros(n, dtype=np.float64)
    stats = np.zeros(4, dtype=np.float64)
    lib.run_position_backtest(_c(prices), _c(positions), n, cost_per_turnover,
                              _c(returns), _c(equity), _c(stats))
    return {
        "returns": returns,
        "equity": equity,
        "total_return": float(stats[0]),
        "sharpe": float(stats[1]),
        "max_drawdown": float(stats[2]),
        "n_trades": int(stats[3]),
    }


def thomas_solve(lower, diag, upper, rhs) -> np.ndarray:
    """Batched float64 Thomas solve; shapes (B, n-1), (B, n), (B, n-1), (B, n)."""
    lib = load()
    lower = np.ascontiguousarray(lower, dtype=np.float64)
    diag = np.ascontiguousarray(diag, dtype=np.float64)
    upper = np.ascontiguousarray(upper, dtype=np.float64)
    rhs = np.ascontiguousarray(rhs, dtype=np.float64)
    if diag.ndim == 1:
        lower, diag, upper, rhs = (a[None, :] for a in (lower, diag, upper, rhs))
    batch, n = diag.shape
    out = np.zeros((batch, n), dtype=np.float64)
    work = np.zeros(2 * n, dtype=np.float64)
    lib.thomas_solve(_c(lower), _c(diag), _c(upper), _c(rhs), n, batch, _c(out), _c(work))
    return out if out.shape[0] > 1 else out[0]


def ou_mle(x, dt: float) -> Tuple[float, float, float]:
    """(theta, mu, sigma) — float64 oracle of models.ou.fit_mle."""
    lib = load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.zeros(3, dtype=np.float64)
    lib.ou_mle(_c(x), len(x), dt, _c(out))
    return float(out[0]), float(out[1]), float(out[2])


def zscore_positions(prices, lookback: int, entry_z: float, exit_z: float) -> np.ndarray:
    lib = load()
    prices = np.ascontiguousarray(prices, dtype=np.float64)
    out = np.zeros(len(prices), dtype=np.float64)
    lib.zscore_positions(_c(prices), len(prices), lookback, entry_z, exit_z, _c(out))
    return out


def heston_price_batch(kappa, theta, sigma, rho, v0, spot, r, q,
                       strikes, maturities, is_call,
                       n_points: int = 1024, du: float = 0.01,
                       alpha: float = 0.75) -> np.ndarray:
    """Float64 Carr-Madan oracle of models.heston.price_carr_madan.

    The scalar per-option loop the reference runs in C++
    (heston.cpp:94-151); used by tests and scripts/native_vs_jax.py to
    cross-check and race the JAX device path on this machine.
    """
    lib = load()
    strikes = np.ascontiguousarray(strikes, dtype=np.float64)
    n = len(strikes)
    maturities = np.ascontiguousarray(
        np.broadcast_to(np.asarray(maturities, dtype=np.float64), (n,))
    )
    is_call = np.ascontiguousarray(
        np.broadcast_to(np.asarray(is_call, dtype=np.float64), (n,))
    )
    out = np.zeros(n, dtype=np.float64)
    lib.heston_price_batch(kappa, theta, sigma, rho, v0, spot, r, q,
                           _c(strikes), _c(maturities), _c(is_call), n,
                           n_points, du, alpha, _c(out))
    return out


def sabr_vols(alpha, beta, rho, nu, forward, maturity, strikes) -> np.ndarray:
    """Float64 Hagan-smile oracle of models.sabr.implied_volatilities."""
    lib = load()
    strikes = np.ascontiguousarray(strikes, dtype=np.float64)
    out = np.zeros(len(strikes), dtype=np.float64)
    lib.sabr_vols(alpha, beta, rho, nu, forward, maturity,
                  _c(strikes), len(strikes), _c(out))
    return out


def bs_implied_vol(target, spot, strike, r, q, maturity, is_call, *,
                   vol0: float = 0.0, max_iter: int = 100,
                   tol: float = 1e-8) -> np.ndarray:
    """Float64 Newton implied-vol oracle of models.black_scholes.implied_vol
    (reference scheme: heston.cpp:311-349).  ``vol0 <= 0`` uses the
    Brenner-Subrahmanyam initial guess."""
    lib = load()
    n = len(np.atleast_1d(strike))
    arrs = [np.ascontiguousarray(np.broadcast_to(np.asarray(a, dtype=np.float64), (n,)))
            for a in (target, spot, strike, maturity, is_call)]
    target, spot, strike, maturity, is_call = arrs
    out = np.zeros(n, dtype=np.float64)
    lib.bs_implied_vol(_c(target), _c(spot), _c(strike), r, q, _c(maturity),
                       _c(is_call), n, vol0, max_iter, tol, _c(out))
    return out


def simulate_fills(tick_times, tick_prices, submit_times, sides, types,
                   limit_prices, stop_prices, quantities, *,
                   slippage_pct: float = 0.0005,
                   market_impact_coeff: float = 0.1,
                   adv: float = 1e6):
    """Native order-stream fill engine (twin of
    backtest.execution.SimulatedExecutionHandler semantics).

    ``sides``: +1 buy / -1 sell.  ``types``: 0 market, 1 limit, 2 stop.
    Orders must be sorted by submit time; they rest until marketable.
    Deliberate difference from the event handler: orders submitted before
    the first valid (positive) price REST until one appears instead of
    being dropped.
    Returns (n_filled, fills) where fills is (n_orders, 4) rows of
    [fill_time, fill_price, commission, slippage] (NaN rows = never filled).
    """
    lib = load()
    tick_times = np.ascontiguousarray(tick_times, dtype=np.float64)
    tick_prices = np.ascontiguousarray(tick_prices, dtype=np.float64)
    n_orders = len(submit_times)
    arrs = [np.ascontiguousarray(a, dtype=np.float64)
            for a in (submit_times, sides, types, limit_prices, stop_prices, quantities)]
    out = np.zeros((n_orders, 4), dtype=np.float64)
    n_filled = lib.simulate_fills(
        _c(tick_times), _c(tick_prices), len(tick_times),
        *(_c(a) for a in arrs), n_orders,
        slippage_pct, market_impact_coeff, adv, _c(out))
    return int(n_filled), out


def bs_pde_solve(S0, sigma, r, q, T, K, *, is_call=True, american=False,
                 n_space: int = 200, n_time: int = 100,
                 s_min_mult: float = 0.2, s_max_mult: float = 5.0,
                 crank_nicolson: bool = True):
    """Float64 log-space CN oracle of solvers.bs_pde.solve.

    Returns (price, V_grid, spot_grid) — the same discretization as the JAX
    march (and the reference black_scholes_pde.hpp), written independently.
    """
    lib = load()
    grid = np.zeros(n_space, dtype=np.float64)
    sgrid = np.zeros(n_space, dtype=np.float64)
    price = lib.bs_pde_solve(S0, sigma, r, q, T, K, int(is_call), int(american),
                             n_space, n_time, s_min_mult, s_max_mult,
                             int(crank_nicolson), _c(grid), _c(sgrid))
    return float(price), grid, sgrid


def heston_adi_solve(kappa, theta, sigma, rho, v0, r, q, T, K, S0, *,
                     is_call=True, american=False,
                     n_spot: int = 100, n_vol: int = 50, n_time: int = 100,
                     s_min_mult: float = 0.2, s_max_mult: float = 5.0,
                     v_max: float = 1.0):
    """Float64 Douglas-ADI oracle of solvers.heston_adi.solve.

    Returns (price, V_grid) with V_grid of shape (n_spot, n_vol) — the same
    scheme (In 't Hout-Foulon boundaries, theta = 1/2) as the JAX march,
    written independently in scalar C++.
    """
    lib = load()
    grid = np.zeros((n_spot, n_vol), dtype=np.float64)
    price = lib.heston_adi_solve(kappa, theta, sigma, rho, v0, r, q, T, K,
                                 int(is_call), int(american), S0,
                                 n_spot, n_vol, n_time,
                                 s_min_mult, s_max_mult, v_max, _c(grid))
    return float(price), grid


def hjb_march(theta, mu, sigma, r, T, x_min, x_max, exercise,
              n_time: int = 200) -> np.ndarray:
    """Float64 implicit-Euler obstacle march: oracle of solvers.hjb._march
    (projection mode).  Returns the final value function on the x grid."""
    lib = load()
    exercise = np.ascontiguousarray(exercise, dtype=np.float64)
    n = len(exercise)
    out = np.zeros(n, dtype=np.float64)
    lib.hjb_march(theta, mu, sigma, r, T, x_min, x_max, n, n_time,
                  _c(exercise), _c(out))
    return out


def hjb_march_bs(theta, mu, sigma, r, T, x_min, x_max, exercise,
                 reverse: bool, n_time: int = 200) -> np.ndarray:
    """Rigorous-LCP (Brennan-Schwartz) implicit march: host twin of
    solvers.hjb._march(method="brennan_schwartz").  The latency backend for
    single tiny stopping problems (the serial chain is CPU-shaped)."""
    lib = load()
    exercise = np.ascontiguousarray(exercise, dtype=np.float64)
    n = len(exercise)
    out = np.zeros(n, dtype=np.float64)
    lib.hjb_march_bs(theta, mu, sigma, r, T, x_min, x_max, n, n_time,
                     _c(exercise), int(bool(reverse)), _c(out))
    return out


def hjb_march_bs_multi(theta, mu, sigma, r, T, x_min, x_max, exercise,
                       reverse, n_time: int = 200) -> np.ndarray:
    """All stopping problems of one pair config in a single call, one thread
    per march.  ``exercise``: (n_problems, n_space); ``reverse``: per-problem
    sweep-direction flags.  Returns the (n_problems, n_space) value functions."""
    lib = load()
    exercise = np.ascontiguousarray(exercise, dtype=np.float64)
    n_problems, n = exercise.shape
    rev = np.ascontiguousarray(
        np.asarray(reverse, dtype=np.int32).reshape(n_problems))
    out = np.zeros((n_problems, n), dtype=np.float64)
    lib.hjb_march_bs_multi(
        theta, mu, sigma, r, T, x_min, x_max, n, n_time, n_problems,
        _c(exercise), rev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _c(out))
    return out
