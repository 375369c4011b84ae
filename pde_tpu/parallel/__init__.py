"""Device mesh, shardings, and multi-chip calibration/PDE paths."""

from . import mesh  # noqa: F401
from .mesh import initialize_distributed, make_mesh, sharded_calibration_step  # noqa: F401
from . import halo  # noqa: F401
from . import dist_tridiag  # noqa: F401
from .dist_tridiag import dist_tridiagonal_solve, partitioned_thomas_spmd  # noqa: F401
from . import adi_sharded  # noqa: F401
from .adi_sharded import sharded_bs_solve, sharded_heston_solve  # noqa: F401
from . import comm_audit  # noqa: F401
from .comm_audit import collective_counts  # noqa: F401
from . import mc  # noqa: F401
from .mc import price_american_lsm_sharded, price_european_mc_sharded  # noqa: F401
