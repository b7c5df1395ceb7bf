"""SE(3) poses as batched JAX pytrees.

Re-design of ``/root/reference/cv-core/src/pose.rs``.  The reference encodes
frame discipline in four newtypes over ``IsometryMatrix3`` (``WorldToCamera``,
``CameraToWorld``, ``CameraToCamera``, ``WorldToWorld``).  Here one pytree
dataclass :class:`Isometry3` holds a batch of rigid transforms as
``rotation (..., 3, 3)`` + ``translation (..., 3)``; thin subclasses keep the
reference's frame vocabulary for API parity.  All ops broadcast over leading
batch dims and are jit/vmap-safe in any float dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from . import projective
from .lie import so3_exp, so3_hat, so3_log
from .smallmat import matmul as _mm, matvec as _mv


@pytree_dataclass
class Isometry3:
    """A rigid transform ``y = R x + t`` (batched)."""

    rotation: jnp.ndarray  # (..., 3, 3)
    translation: jnp.ndarray  # (..., 3)

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape: tuple = (), dtype=jnp.float64):
        return cls(
            rotation=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            translation=jnp.zeros(batch_shape + (3,), dtype=dtype),
        )

    @classmethod
    def from_parts(cls, translation: jnp.ndarray, rotation: jnp.ndarray):
        """From a translation vector and a rotation matrix (pose.rs:44-47)."""
        return cls(rotation=jnp.asarray(rotation), translation=jnp.asarray(translation))

    @classmethod
    def from_se3(cls, se3: jnp.ndarray):
        """From the reference's se(3) vector ``[t, log R]`` (pose.rs:62-68).

        Note the reference stores the *raw* translation (not V^-1 t).
        """
        return cls(rotation=so3_exp(se3[..., 3:6]), translation=se3[..., 0:3])

    @classmethod
    def from_scaled_axis(cls, translation: jnp.ndarray, scaled_axis: jnp.ndarray):
        return cls(rotation=so3_exp(scaled_axis), translation=translation)

    @classmethod
    def from_tangent(cls, translation: jnp.ndarray, rotation: jnp.ndarray):
        """``Se3TangentSpace.isometry`` convention: ``(R, R @ translation)``."""
        r = so3_exp(rotation)
        return cls(rotation=r, translation=_mv(r, translation))

    # -- basic ops -----------------------------------------------------------
    @property
    def batch_shape(self):
        return self.translation.shape[:-1]

    @property
    def dtype(self):
        return self.translation.dtype

    def inverse(self) -> "Isometry3":
        rt = jnp.swapaxes(self.rotation, -1, -2)
        return type(self)(
            rotation=rt, translation=-_mv(rt, self.translation)
        )

    def compose(self, other: "Isometry3") -> "Isometry3":
        """self after other: (self @ other)(x) = self(other(x))."""
        return Isometry3(
            rotation=_mm(self.rotation, other.rotation),
            translation=_mv(self.rotation, other.translation) + self.translation,
        )

    def __matmul__(self, other: "Isometry3") -> "Isometry3":
        return self.compose(other)

    def scale(self, scale) -> "Isometry3":
        """Scale the translation component (pose.rs:35-41)."""
        return type(self)(
            rotation=self.rotation,
            translation=self.translation * jnp.asarray(scale)[..., None],
        )

    def homogeneous(self) -> jnp.ndarray:
        """4x4 homogeneous matrix (pose.rs:50-52)."""
        top = jnp.concatenate([self.rotation, self.translation[..., :, None]], axis=-1)
        bottom_row = jnp.concatenate(
            [
                jnp.zeros_like(self.translation),
                jnp.ones_like(self.translation[..., :1]),
            ],
            axis=-1,
        )
        return jnp.concatenate([top, bottom_row[..., None, :]], axis=-2)

    def matrix3x4(self) -> jnp.ndarray:
        return jnp.concatenate([self.rotation, self.translation[..., :, None]], axis=-1)

    def se3(self) -> jnp.ndarray:
        """Reference se(3) vector ``[t, log R]`` (pose.rs:55-60)."""
        return jnp.concatenate([self.translation, so3_log(self.rotation)], axis=-1)

    # -- point transforms ----------------------------------------------------
    def apply(self, p: jnp.ndarray) -> jnp.ndarray:
        """Transform euclidean 3-points ``(..., 3)``."""
        return _mv(self.rotation, p) + self.translation

    def rotate(self, v: jnp.ndarray) -> jnp.ndarray:
        """Rotate vectors/bearings (no translation)."""
        return _mv(self.rotation, v)

    def transform(self, hp: jnp.ndarray) -> jnp.ndarray:
        """Transform projective points ``(..., 4)``, renormalized
        (pose.rs:120-122)."""
        out = self.transform_unnormalized(hp)
        return projective.from_homogeneous(out)

    def transform_unnormalized(self, hp: jnp.ndarray) -> jnp.ndarray:
        xyz = (
            _mv(self.rotation, hp[..., :3])
            + self.translation * hp[..., 3:4]
        )
        w = jnp.broadcast_to(hp[..., 3:4], xyz.shape[:-1] + (1,))
        return jnp.concatenate([xyz, w], axis=-1)

    def transform_jacobians(self, hp: jnp.ndarray):
        """Transform + Jacobians w.r.t. input point and pose (pose.rs:70-90).

        Returns ``(output, d_output/d_input (..., 4, 4),
        d_output/d_[t, w] (..., 4, 6))`` where the output here is the *raw*
        homogeneous product (pre-normalization), matching the reference's
        internal jacobian convention (pose.rs:131-174).  The perturbation
        model for the pose block is a right-perturbation of translation and
        rotation-output as in ``pose_jacobian_self``.
        """
        h = self.homogeneous()
        rotated_xyz = _mv(self.rotation, hp[..., :3])
        output = self.transform_unnormalized(hp)
        jac_input = h
        w = hp[..., 3:4]
        eye4 = jnp.broadcast_to(jnp.eye(4, dtype=hp.dtype), output.shape[:-1] + (4, 4))
        dp_dt = eye4 * w[..., None]
        # translation homogeneous matrix
        t_h = Isometry3(
            rotation=jnp.broadcast_to(
                jnp.eye(3, dtype=hp.dtype), self.rotation.shape
            ),
            translation=self.translation,
        ).homogeneous()
        hat_rot = so3_hat(rotated_xyz)  # (..., 3, 3)
        hat_h = jnp.zeros(hat_rot.shape[:-2] + (4, 4), dtype=hp.dtype)
        hat_h = hat_h.at[..., :3, :3].set(hat_rot)
        hat_h = hat_h.at[..., 3, 3].set(1.0)
        dp_ds = _mm(t_h, hat_h)
        # Reference packs [dp_dt rows 0..3; dp_ds rows 0..3] as a 6x4 then
        # transposes (pose.rs:157-173): final (..., i, j) = stacked(j, i).
        stacked = jnp.concatenate([dp_dt[..., :3, :], dp_ds[..., :3, :]], axis=-2)
        jac_self = jnp.swapaxes(stacked, -1, -2)
        return projective.from_homogeneous(output), jac_input, jac_self


@pytree_dataclass
class WorldToCamera(Isometry3):
    """Pose of the world relative to a camera: WorldPoint -> CameraPoint."""


@pytree_dataclass
class CameraToWorld(Isometry3):
    """Camera extrinsics: CameraPoint -> WorldPoint."""


@pytree_dataclass
class CameraToCamera(Isometry3):
    """Relative pose: CameraPoint of A -> CameraPoint of B."""


@pytree_dataclass
class WorldToWorld(Isometry3):
    """Relative transform between two reconstructions' world frames."""

    @classmethod
    def from_camera_poses(cls, a_pose: Isometry3, b_pose: Isometry3) -> "WorldToWorld":
        """From one camera's pose in both reconstructions (pose.rs:322-324)."""
        iso = b_pose.inverse().compose(a_pose)
        return cls(rotation=iso.rotation, translation=iso.translation)


def world_to_camera_residual(pose: Isometry3, bearing: jnp.ndarray, world_point: jnp.ndarray):
    """``Model<FeatureWorldMatch>::residual`` (pose.rs:194-202):
    ``1 - bearing . bearing(pose @ world_point)``.

    Broadcasts over batches of poses and/or matches.
    """
    obs = projective.bearing(pose.transform(world_point))
    return 1.0 - jnp.sum(bearing * obs, axis=-1)


def camera_to_camera_residual(pose: Isometry3, a: jnp.ndarray, b: jnp.ndarray):
    """``Model<FeatureMatch>::residual`` for a relative pose (pose.rs:249-296).

    Triangulates via the symmetric 4x4 DLT (smallest eigenvector of the
    accumulated design matrix) and scores cheirality + cosine distance; any
    non-finite result maps to 2.0 exactly like the reference.
    """
    dtype = a.dtype
    eye_pose = Isometry3.identity(dtype=dtype)
    design = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], pose.batch_shape) + (4, 4), dtype)
    for p, bearing_vec in ((eye_pose, a), (pose, b)):
        pm = p.matrix3x4()  # (..., 3, 4)
        # Tiny-matrix contractions written elementwise: a dot_general with a
        # 4-wide trailing dim materializes in MXU-tiled layout (lane pad
        # 4 -> 128, a 32x HBM blowup at RANSAC batch sizes) and rounds to
        # bf16 at default precision.  b (b^T pm) == (b b^T) pm exactly.
        s = jnp.sum(bearing_vec[..., :, None] * pm, axis=-2)  # (..., 4)
        term = pm - bearing_vec[..., :, None] * s[..., None, :]  # (..., 3, 4)
        for k in range(3):
            tk = term[..., k, :]
            design = design + tk[..., :, None] * tk[..., None, :]
    from ..ops.eigen import eigh4

    # Batched Jacobi: jnp.linalg.eigh's general decomposition allocates
    # large HBM temporaries and dominates RANSAC scoring.
    eigvals, eigvecs = eigh4(design)
    # ascending eigenvalues; the reference picks min |eigenvalue|.
    idx = jnp.argmin(jnp.abs(eigvals), axis=-1)
    v = jnp.take_along_axis(eigvecs, idx[..., None, None], axis=-1)[..., 0]
    pt = projective.from_homogeneous(v)
    finite = projective.is_finite(pt)
    bearing_a = projective.bearing(pt)
    bearing_b = projective.bearing(pose.transform(pt))
    res = 0.5 * (
        1.0
        - jnp.sum(a * bearing_a, axis=-1)
        + 1.0
        - jnp.sum(b * bearing_b, axis=-1)
    )
    res = jnp.where(finite & jnp.isfinite(res), res, 2.0)
    return res
