"""Pricing models: Heston (classic + rough), Bates, SVCJ, SABR, OU,
Black-Scholes."""

from . import (  # noqa: F401
    bates,
    black_scholes,
    digital,
    forward_start,
    heston,
    heston_mc,
    credit,
    g2,
    local_vol,
    multi_asset,
    ou,
    rates,
    rough_heston,
    rough_heston_mc,
    sabr,
    slv,
    svcj,
    varswap,
    vix,
)
from .bates import BatesParams  # noqa: F401
from .svcj import SVCJParams  # noqa: F401
from .forward_start import ForwardStartParams  # noqa: F401
from .g2 import G2Params  # noqa: F401
from .heston import HestonParams  # noqa: F401
from .ou import OUParams  # noqa: F401
from .rates import CIRParams, DiscountCurve, HullWhiteParams, VasicekParams  # noqa: F401
from .rough_heston import RoughHestonParams  # noqa: F401
from .sabr import SABRParams  # noqa: F401
