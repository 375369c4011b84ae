"""Core primitives: precision policy, functional grids, configuration."""

from . import grids, precision  # noqa: F401
