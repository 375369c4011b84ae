"""Data pipeline: options analytics, providers, validation, streaming,
reference data."""

from . import options  # noqa: F401
from .options import OptionsChainProcessor, SVIParameterization, VolatilitySurface  # noqa: F401

for _name in ("providers", "validation", "streaming", "ingestion", "reference", "recovery", "monitoring", "api"):
    try:
        __import__(f"{__name__}.{_name}")
    except ImportError:  # pragma: no cover
        pass
del _name
