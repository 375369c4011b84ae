"""Compute kernels: batched tridiagonal solves, PDE stencils."""

from . import tridiag  # noqa: F401
from .tridiag import pcr, thomas, tridiagonal_solve  # noqa: F401
