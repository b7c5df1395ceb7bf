"""AKAZE feature extraction: nonlinear scale space + M-LDB descriptors."""

from .config import Akaze, allocate_evolutions
from .extract import AkazeExtractor, load_gray, to_gray_f32

__all__ = ["Akaze", "AkazeExtractor", "allocate_evolutions", "load_gray", "to_gray_f32"]
