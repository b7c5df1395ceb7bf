"""Minimal solvers: eight-point, Nister-Stewenius five-point, Lambda-Twist P3P."""

from . import eight_point

__all__ = ["eight_point"]
