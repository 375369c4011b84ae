"""PDE solvers: Crank-Nicolson 1D (constant + local vol), Douglas ADI 2D
(In 't Hout-Foulon boundaries), HJB optimal stopping, Longstaff-Schwartz."""

from . import bs_pde, heston_adi, heston_adi_ref, hjb, local_vol_pde, lsm  # noqa: F401
