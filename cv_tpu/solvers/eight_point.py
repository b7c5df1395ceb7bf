"""Batched eight-point essential-matrix estimation.

Re-design of ``/root/reference/eight-point/src/lib.rs``: the per-sample
constraint encoding and 9x9 symmetric-eigen nullspace extraction are written
over a leading hypothesis batch, so a RANSAC pass solves thousands of minimal
problems in one ``vmap``-free vectorized call.
"""

from __future__ import annotations

import jax.numpy as jnp
from ..core import smallmat

from ..camera import essential
from ..core.pose import CameraToCamera

MIN_SAMPLES = 8
MODELS_PER_SAMPLE = 4


def encode_epipolar_equation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Constraint rows for matches ``a``/``b`` of shape ``(..., K, 3)``.

    Mirrors the reference encoding (eight-point/src/lib.rs:11-24) including
    its quirk of normalizing *both* bearings by ``a.z``; row layout is
    ``row[3j + i] = ap[j] * bp[i]`` so the flattened nullspace vector maps to
    ``E[i, j] = v[3j + i]`` (column-major like nalgebra's from_iterator).
    """
    ap = a / a[..., 2:3]
    bp = b / a[..., 2:3]
    return (ap[..., :, None] * bp[..., None, :]).reshape(a.shape[:-1] + (9,))


def essential_from_matches(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Least-squares essential matrix from >= 8 matches ``(..., K, 3)``.

    Smallest eigenvector of the 9x9 normal matrix (lib.rs:44-60); returns
    ``(..., 3, 3)``.
    """
    rows = encode_epipolar_equation(a, b)  # (..., K, 9)
    eet = smallmat.matmul_tn(rows, rows)
    from ..ops.eigen import eigh_small

    _, vecs = eigh_small(eet, sweeps=8)  # ascending eigenvalues
    v = vecs[..., :, 0]
    # E[i, j] = v[3j + i]
    return jnp.swapaxes(v.reshape(v.shape[:-1] + (3, 3)), -1, -2)


def estimate(a: jnp.ndarray, b: jnp.ndarray) -> CameraToCamera:
    """Estimator::estimate (lib.rs:70-84): minimal sets ``(..., 8, 3)`` ->
    4 candidate relative poses per set, batched with a trailing model axis.

    Returns a ``CameraToCamera`` whose batch shape is ``(..., 4)``.
    """
    e = essential_from_matches(a, b)
    return essential.possible_unscaled_poses(e)
