"""PDE solvers: Crank-Nicolson 1D, Craig-Sneyd ADI 2D, HJB optimal stopping."""

from . import bs_pde, heston_adi, hjb  # noqa: F401
