# Typed public-API stubs for the native host runtime (ctypes C-ABI layer).
# Role parity with the reference's pybind11 stub file
# (src/python/quant_trading/cpp/quant_cpp.pyi:1-250): IDE/type-checker
# surface for the compiled boundary, where runtime signatures live behind
# ctypes and give tooling nothing to see.

from pathlib import Path
from typing import Dict, Sequence, Tuple, TypedDict, Union

import numpy as np
import numpy.typing as npt

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

FloatArray = npt.NDArray[np.float64]
ArrayLike = Union[Sequence[float], npt.NDArray[np.floating]]

class NativeUnavailable(RuntimeError): ...

def is_available() -> bool: ...
def build(force: bool = False) -> Path: ...

def aggregate_bars(
    times: ArrayLike,
    prices: ArrayLike,
    sizes: ArrayLike,
    bar_seconds: float,
) -> FloatArray: ...

class BacktestStats(TypedDict):
    returns: FloatArray
    equity: FloatArray
    total_return: float
    sharpe: float
    max_drawdown: float
    n_trades: int

def run_position_backtest(
    prices: ArrayLike,
    positions: ArrayLike,
    cost_per_turnover: float = 0.0,
) -> BacktestStats: ...

def thomas_solve(
    lower: ArrayLike,
    diag: ArrayLike,
    upper: ArrayLike,
    rhs: ArrayLike,
) -> FloatArray: ...

def ou_mle(x: ArrayLike, dt: float) -> Tuple[float, float, float]: ...

def zscore_positions(
    prices: ArrayLike,
    lookback: int,
    entry_z: float,
    exit_z: float,
) -> FloatArray: ...

def heston_price_batch(
    kappa: float,
    theta: float,
    sigma: float,
    rho: float,
    v0: float,
    spot: float,
    r: float,
    q: float,
    strikes: ArrayLike,
    maturities: Union[float, ArrayLike],
    is_call: Union[bool, float, ArrayLike],
    n_points: int = 1024,
    du: float = 0.01,
    alpha: float = 0.75,
) -> FloatArray: ...

def sabr_vols(
    alpha: float,
    beta: float,
    rho: float,
    nu: float,
    forward: float,
    maturity: float,
    strikes: ArrayLike,
) -> FloatArray: ...

def bs_implied_vol(
    target: Union[float, ArrayLike],
    spot: Union[float, ArrayLike],
    strike: Union[float, ArrayLike],
    r: float,
    q: float,
    maturity: Union[float, ArrayLike],
    is_call: Union[bool, float, ArrayLike],
    *,
    vol0: float = 0.0,
    max_iter: int = 100,
    tol: float = 1e-8,
) -> FloatArray: ...

def simulate_fills(
    tick_times: ArrayLike,
    tick_prices: ArrayLike,
    submit_times: ArrayLike,
    sides: ArrayLike,
    types: ArrayLike,
    limit_prices: ArrayLike,
    stop_prices: ArrayLike,
    quantities: ArrayLike,
    *,
    slippage_pct: float = 0.0005,
    market_impact_coeff: float = 0.1,
    adv: float = 1e6,
) -> Tuple[int, FloatArray]: ...

def bs_pde_solve(
    S0: float,
    sigma: float,
    r: float,
    q: float,
    T: float,
    K: float,
    *,
    is_call: bool = True,
    american: bool = False,
    n_space: int = 200,
    n_time: int = 100,
    s_min_mult: float = 0.2,
    s_max_mult: float = 5.0,
    crank_nicolson: bool = True,
) -> Tuple[float, FloatArray, FloatArray]: ...

def heston_adi_solve(
    kappa: float,
    theta: float,
    sigma: float,
    rho: float,
    v0: float,
    r: float,
    q: float,
    T: float,
    K: float,
    S0: float,
    *,
    is_call: bool = True,
    american: bool = False,
    n_spot: int = 100,
    n_vol: int = 50,
    n_time: int = 100,
    s_min_mult: float = 0.2,
    s_max_mult: float = 5.0,
    v_max: float = 1.0,
) -> Tuple[float, FloatArray]: ...

def hjb_march(
    theta: float,
    mu: float,
    sigma: float,
    r: float,
    T: float,
    x_min: float,
    x_max: float,
    exercise: ArrayLike,
    n_time: int = 200,
) -> FloatArray: ...

def hjb_march_bs(
    theta: float,
    mu: float,
    sigma: float,
    r: float,
    T: float,
    x_min: float,
    x_max: float,
    exercise: ArrayLike,
    reverse: bool,
    n_time: int = 200,
) -> FloatArray: ...

def hjb_march_bs_multi(
    theta: float,
    mu: float,
    sigma: float,
    r: float,
    T: float,
    x_min: float,
    x_max: float,
    exercise: ArrayLike,
    reverse: ArrayLike,
    n_time: int = 200,
) -> FloatArray: ...
