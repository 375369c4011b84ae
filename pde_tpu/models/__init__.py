"""Pricing models: Heston, SABR, OU, Black-Scholes."""

from . import black_scholes, heston, heston_mc, ou, sabr  # noqa: F401
from .heston import HestonParams  # noqa: F401
from .ou import OUParams  # noqa: F401
from .sabr import SABRParams  # noqa: F401
