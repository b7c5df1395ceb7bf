"""Geometry kernels: epipolar gradients and losses (cv-geom)."""

from . import epipolar

__all__ = ["epipolar"]
