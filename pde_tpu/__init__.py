"""pde_tpu — a TPU-native quantitative trading framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
C++/Python platform (dharvpat/PDE): stochastic-volatility pricing (Heston,
SABR), finite-difference PDE solvers (Crank-Nicolson, Craig-Sneyd ADI, HJB
optimal stopping), OU mean-reversion fitting, batched surface calibration,
and the strategy/risk/backtest/execution/data stack above them.

Compute-path design: parameters are pytrees, pricers are pure broadcasting
functions, solvers are ``lax.scan`` over time with batched tridiagonal
kernels, calibration is a jitted vmapped optimizer over whole surfaces, and
multi-device scaling uses ``jax.sharding`` meshes (quote-axis data-parallel,
grid-axis sharding for PDEs).

Submodule imports are individually guarded (mirroring the reference's
optional-import lattice, src/python/quant_trading/__init__.py:34-96) so a
partial environment still imports.
"""

__version__ = "0.1.0"

from . import core, utils  # noqa: F401  (always available)

_OPTIONAL_SUBMODULES = [
    "models",
    "ops",
    "solvers",
    "calibrate",
    "parallel",
    "signals",
    "risk",
    "backtest",
    "validation",
    "data",
    "execution",
    "database",
    "monitoring",
    "serving",
    "trading_system",
    # NOT cli: `python -m pde_tpu.cli` would find it pre-imported by the
    # package and emit a runpy double-import warning; import it explicitly
]

for _name in _OPTIONAL_SUBMODULES:
    try:
        __import__(f"{__name__}.{_name}")
    except ImportError:  # pragma: no cover - partial-install tolerance
        pass
del _name
