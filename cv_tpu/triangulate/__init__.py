"""Triangulators (cv-geom): LinearEigen, RelativeDlt, SineL1, MeanMean, Angular L1/Linf."""

from .linear_eigen import triangulate_observations, triangulate_relative

__all__ = ["triangulate_observations", "triangulate_relative"]
