"""Native library loader: builds and binds libpde_host via ctypes.

The reference exposes its C++ through pybind11 (src/cpp/bindings); this image
has no pybind11, so the native runtime uses a plain C ABI + ctypes.  The
shared object is compiled on demand with g++ (-O3 -march=native) into
``build/`` next to the sources and cached; environments without a compiler
degrade gracefully (``is_available()`` returns False and callers fall back to
the jnp/numpy paths).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

__all__ = ["load", "is_available", "build", "NativeUnavailable"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SOURCES = [
    _REPO_ROOT / "src" / "cpp" / "pde_host.cpp",
    _REPO_ROOT / "src" / "cpp" / "pde_solvers.cpp",
]
_BUILD_DIR = Path(os.environ.get("PDE_TPU_BUILD_DIR", _REPO_ROOT / "build"))

_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


class NativeUnavailable(RuntimeError):
    pass


def _lib_path() -> Path:
    h = hashlib.sha256()
    for src in _SOURCES:
        h.update(src.read_bytes())
    return _BUILD_DIR / f"libpde_host-{h.hexdigest()[:12]}.so"


def build(force: bool = False) -> Path:
    """Compile the shared library if the cached build is stale."""
    path = _lib_path()
    if path.exists() and not force:
        return path
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread",
        *[str(s) for s in _SOURCES], "-o", str(path),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if proc.returncode != 0:
        raise NativeUnavailable(f"g++ build failed:\n{proc.stderr}")
    return path


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    dbl_p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64

    lib.aggregate_bars.argtypes = [dbl_p, dbl_p, dbl_p, i64, ctypes.c_double, dbl_p, i64]
    lib.aggregate_bars.restype = i64

    lib.run_position_backtest.argtypes = [dbl_p, dbl_p, i64, ctypes.c_double, dbl_p, dbl_p, dbl_p]
    lib.run_position_backtest.restype = None

    lib.thomas_solve.argtypes = [dbl_p, dbl_p, dbl_p, dbl_p, i64, i64, dbl_p, dbl_p]
    lib.thomas_solve.restype = None

    lib.ou_mle.argtypes = [dbl_p, i64, ctypes.c_double, dbl_p]
    lib.ou_mle.restype = None

    lib.zscore_positions.argtypes = [dbl_p, i64, i64, ctypes.c_double, ctypes.c_double, dbl_p]
    lib.zscore_positions.restype = None

    dbl = ctypes.c_double
    lib.heston_price_batch.argtypes = [dbl] * 8 + [dbl_p, dbl_p, dbl_p, i64,
                                                   i64, dbl, dbl, dbl_p]
    lib.heston_price_batch.restype = None

    lib.sabr_vols.argtypes = [dbl] * 6 + [dbl_p, i64, dbl_p]
    lib.sabr_vols.restype = None

    lib.bs_implied_vol.argtypes = [dbl_p, dbl_p, dbl_p, dbl, dbl, dbl_p,
                                   dbl_p, i64, dbl, i64, dbl, dbl_p]
    lib.bs_implied_vol.restype = None

    lib.simulate_fills.argtypes = [dbl_p, dbl_p, i64,
                                   dbl_p, dbl_p, dbl_p, dbl_p, dbl_p, dbl_p, i64,
                                   dbl, dbl, dbl, dbl_p]
    lib.simulate_fills.restype = i64

    # pde_solvers.cpp: float64 PDE-solver oracles
    i32 = ctypes.c_int32
    lib.bs_pde_solve.argtypes = [dbl] * 6 + [i32, i32, i64, i64, dbl, dbl, i32,
                                             dbl_p, dbl_p]
    lib.bs_pde_solve.restype = dbl

    lib.heston_adi_solve.argtypes = [dbl] * 9 + [i32, i32, dbl, i64, i64, i64,
                                                 dbl, dbl, dbl, dbl_p]
    lib.heston_adi_solve.restype = dbl

    lib.hjb_march.argtypes = [dbl] * 7 + [i64, i64, dbl_p, dbl_p]
    lib.hjb_march.restype = None

    lib.hjb_march_bs.argtypes = [dbl] * 7 + [i64, i64, dbl_p,
                                             ctypes.c_int32, dbl_p]
    lib.hjb_march_bs.restype = None

    i32_p = ctypes.POINTER(ctypes.c_int32)
    lib.hjb_march_bs_multi.argtypes = [dbl] * 7 + [i64, i64, i64,
                                                   dbl_p, i32_p, dbl_p]
    lib.hjb_march_bs_multi.restype = None

    lib.pde_host_abi_version.restype = ctypes.c_int32
    return lib


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        raise NativeUnavailable(_load_error)
    try:
        path = build()
        _lib = _bind(ctypes.CDLL(str(path)))
        assert _lib.pde_host_abi_version() == 3
        return _lib
    except Exception as exc:  # noqa: BLE001 - record and degrade
        _load_error = str(exc)
        raise NativeUnavailable(_load_error) from exc


def is_available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False
