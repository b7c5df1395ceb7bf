"""Homogeneous projective 3d points.

Re-design of ``/root/reference/cv-core/src/point.rs``: a projective point is a
homogeneous 4-vector whose xyz part is unit-norm and whose ``w`` is the
(non-negative) reciprocal distance — ``w == 0`` encodes a point at infinity.

Points are plain ``(..., 4)`` arrays; these functions enforce/exploit the
invariant.  ``CameraPoint`` / ``WorldPoint`` of the reference are the same
representation in different frames — frame discipline lives in the pose types
(:mod:`cv_tpu.core.pose`).
"""

from __future__ import annotations

import jax.numpy as jnp


def from_homogeneous(point: jnp.ndarray) -> jnp.ndarray:
    """Normalize an arbitrary homogeneous 4-vector to the invariant form.

    Flips sign so ``w`` is non-negative, then scales so xyz is unit-norm
    (point.rs:19-25).
    """
    # Sign-flip so w >= 0 (TPU-safe: avoid signbit, which lacks an f64
    # lowering; -0.0 stays -0.0, which divides identically).
    point = jnp.where(point[..., 3:4] < 0, -point, point)
    norm = jnp.linalg.norm(point[..., :3], axis=-1, keepdims=True)
    return point / norm


def from_point(p: jnp.ndarray) -> jnp.ndarray:
    """Euclidean ``(..., 3)`` point -> projective ``(..., 4)``."""
    ones = jnp.ones_like(p[..., :1])
    return from_homogeneous(jnp.concatenate([p, ones], axis=-1))


def point(hp: jnp.ndarray) -> jnp.ndarray:
    """Projective -> euclidean ``(..., 3)``.  Infinite points yield inf."""
    return hp[..., :3] / hp[..., 3:4]


def bearing(hp: jnp.ndarray) -> jnp.ndarray:
    """Unit bearing of the point (its xyz part, already unit-norm)."""
    return hp[..., :3]


def is_finite(hp: jnp.ndarray) -> jnp.ndarray:
    """Mask of points whose components are all finite."""
    return jnp.all(jnp.isfinite(hp), axis=-1)
