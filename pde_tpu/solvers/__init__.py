"""PDE solvers: Crank-Nicolson 1D, Douglas ADI 2D (In 't Hout-Foulon boundaries), HJB optimal stopping."""

from . import bs_pde, heston_adi, heston_adi_ref, hjb, lsm  # noqa: F401
