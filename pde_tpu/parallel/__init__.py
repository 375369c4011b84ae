"""Device mesh, shardings, and multi-chip calibration steps."""

from . import mesh  # noqa: F401
from .mesh import make_mesh, sharded_calibration_step  # noqa: F401
from . import halo  # noqa: F401
