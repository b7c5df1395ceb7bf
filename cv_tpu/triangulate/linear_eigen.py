"""Linear-Eigen (Hartley & Sturm) triangulation, batched.

Re-design of ``/root/reference/cv-geom/src/triangulation.rs:40-130``: the
per-landmark accumulation of 4x4 normal matrices and symmetric eigen solve
are batched over landmarks (and any leading dims), with masks standing in
for the reference's Option returns.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import projective
from ..core.pose import Isometry3
from ..core import smallmat


def triangulate_observations(
    poses: Isometry3,
    bearings: jnp.ndarray,
    valid: jnp.ndarray | None = None,
):
    """Triangulate one world point per batch element from >= 2 observations.

    ``poses``: WorldToCamera with batch shape ``(..., V)``;
    ``bearings``: ``(..., V, 3)`` unit bearings;
    ``valid``: optional ``(..., V)`` mask of real observations.

    Returns ``(point (..., 4), ok (...,))`` where ``ok`` combines the
    finite and cheirality checks (triangulation.rs:108-129).
    """
    pm = poses.matrix3x4()  # (..., V, 3, 4)
    # Elementwise small-matrix forms (full f32, native layout; see
    # core/smallmat.py): b (b^T pm) == (b b^T) pm exactly for unit b.
    s = jnp.sum(bearings[..., :, None] * pm, axis=-2)  # (..., V, 4)
    term = pm - bearings[..., :, None] * s[..., None, :]  # (..., V, 3, 4)
    if valid is not None:
        term = jnp.where(valid[..., None, None], term, 0.0)
    design = jnp.sum(
        term[..., :, :, None] * term[..., :, None, :], axis=(-4, -3)
    )
    from ..ops.eigen import eigh4

    _, vecs = eigh4(design)
    point = projective.from_homogeneous(vecs[..., :, 0])
    finite = projective.is_finite(point)
    # Cheirality (triangulation.rs:121-128): rotate each bearing to world
    # (inverse pose rotation) and require non-negative dot with the point's
    # world bearing.
    world_bearing = smallmat.matvec_t(poses.rotation, bearings)
    cheir = jnp.sum(world_bearing * point[..., None, :3], axis=-1) >= 0.0
    if valid is not None:
        cheir = cheir | ~valid
    ok = finite & jnp.all(cheir, axis=-1)
    return point, ok


def triangulate_relative(pose: Isometry3, a: jnp.ndarray, b: jnp.ndarray):
    """Two-view special case (cv-core/src/triangulation.rs:52-67): camera A
    is the world frame; ``pose`` maps A -> B. Returns ``(point (..., 4), ok)``
    in A's frame."""
    eye = Isometry3.identity(batch_shape=pose.batch_shape, dtype=a.dtype)
    poses = Isometry3(
        rotation=jnp.stack([eye.rotation, pose.rotation], axis=-3),
        translation=jnp.stack([eye.translation, pose.translation], axis=-2),
    )
    bearings = jnp.stack([a, b], axis=-2)
    return triangulate_observations(poses, bearings)
