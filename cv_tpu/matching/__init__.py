"""Descriptor matching: Hamming k-NN on the MXU, LSH bag-of-features."""

from .hamming import (
    distance_matrix,
    distance_matrix_mxu,
    lowes_ratio_matches,
    match_descriptors,
    symmetric_matches,
)

__all__ = [
    "distance_matrix",
    "distance_matrix_mxu",
    "lowes_ratio_matches",
    "match_descriptors",
    "symmetric_matches",
]
