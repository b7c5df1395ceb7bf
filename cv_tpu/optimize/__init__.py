"""Pose optimizers (cv-optimize): single-view PnP refinement and three-view
relative-pose gradient descent (L1/L2/adaptive), plus general Levenberg-
Marquardt least squares (cv::optimize::lm facade parity)."""

from .lm import LMResult, levenberg_marquardt
from .optimizers import (
    single_view_simple_optimize_l1,
    single_view_simple_optimize_l2,
    three_view_adaptive_optimize_l2,
    three_view_simple_optimize_l1,
    three_view_simple_optimize_l2,
)

__all__ = [
    "LMResult",
    "levenberg_marquardt",
    "single_view_simple_optimize_l1",
    "single_view_simple_optimize_l2",
    "three_view_simple_optimize_l1",
    "three_view_simple_optimize_l2",
    "three_view_adaptive_optimize_l2",
]
