"""Essential matrix: residual, reconditioning, pose decomposition.

Re-design of ``/root/reference/cv-pinhole/src/essential.rs`` as batched JAX
ops over ``(..., 3, 3)`` essential matrices.  Decomposition uses
``jnp.linalg.svd`` (batched); the reference's per-matrix nalgebra SVD loop
becomes one vectorized call.  The 4-fold pose ambiguity set is invariant to
SVD sign conventions (joint column flips either keep or swap the W/Wt
rotations and negate t, all of which are enumerated), so pose sets match the
reference at the set level.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import smallmat
from ..core.lie import so3_hat
from ..core.pose import CameraToCamera, Isometry3
from ..ops.eigen import svd3


def essential_from_pose(pose: Isometry3) -> jnp.ndarray:
    """E = [t]x R (essential.rs:260-264)."""
    return smallmat.matmul(so3_hat(pose.translation), pose.rotation)


def residual(e: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """|b'^T E a'| on z-normalized coordinates (essential.rs:266-275).

    ``e``: (..., 3, 3); ``a``/``b``: (..., 3) unit bearings. Broadcasts.
    """
    ap = a / a[..., 2:3]
    bp = b / b[..., 2:3]
    return jnp.abs(jnp.sum(bp[..., :, None] * e * ap[..., None, :], axis=(-2, -1)))


def recondition(e: jnp.ndarray) -> jnp.ndarray:
    """Closest true essential matrix: average the two large singular values,
    zero the third (essential.rs:64-77)."""
    u, s, vt = svd3(e)
    avg = 0.5 * (s[..., 0] + s[..., 1])
    s_new = jnp.stack([avg, avg, jnp.zeros_like(avg)], axis=-1)
    return smallmat.matmul(u * s_new[..., None, :], vt)


def possible_rotations_unscaled_translation(e: jnp.ndarray):
    """Two candidate rotations + unscaled translation (essential.rs:114-162).

    Returns ``(rot_a (..., 3, 3), rot_b (..., 3, 3), t (..., 3))``.
    """
    dtype = e.dtype
    w = jnp.array(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=dtype
    )
    u, _, vt = svd3(e)
    # Force positive determinants (handedness): flip last column of U / last
    # row of Vt (essential.rs:139-153).
    det_u = jnp.linalg.det(u)
    u = u.at[..., :, 2].multiply(jnp.where(det_u < 0, -1.0, 1.0)[..., None])
    det_vt = jnp.linalg.det(vt)
    vt = vt.at[..., 2, :].multiply(jnp.where(det_vt < 0, -1.0, 1.0)[..., None])
    rot_a = smallmat.matmul(smallmat.matmul(u, w), vt)
    rot_b = smallmat.matmul(smallmat.matmul(u, w.T), vt)
    t = u[..., :, 2]
    return rot_a, rot_b, t


def possible_unscaled_poses(e: jnp.ndarray) -> CameraToCamera:
    """The 4-fold pose ambiguity as a batched pose with a leading axis of 4
    (essential.rs:217-231): (t, Ra), (t, Rb), (-t, Ra), (-t, Rb)."""
    rot_a, rot_b, t = possible_rotations_unscaled_translation(e)
    rots = jnp.stack([rot_a, rot_b, rot_a, rot_b], axis=-3)
    ts = jnp.stack([t, t, -t, -t], axis=-2)
    return CameraToCamera(rotation=rots, translation=ts)


def possible_unscaled_poses_bearing(e: jnp.ndarray) -> CameraToCamera:
    """2-fold variant ignoring translation sign (essential.rs:237-249)."""
    rot_a, rot_b, t = possible_rotations_unscaled_translation(e)
    rots = jnp.stack([rot_a, rot_b], axis=-3)
    ts = jnp.stack([t, t], axis=-2)
    return CameraToCamera(rotation=rots, translation=ts)
