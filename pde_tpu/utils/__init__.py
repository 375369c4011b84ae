"""Math/stat utilities (norm CDF/PDF, covariance, PD repair, EWMA)."""

from . import linalg, stats  # noqa: F401
