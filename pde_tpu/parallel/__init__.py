"""Device mesh, shardings, and multi-chip calibration steps."""

from . import mesh  # noqa: F401
from .mesh import initialize_distributed, make_mesh, sharded_calibration_step  # noqa: F401
from . import halo  # noqa: F401
