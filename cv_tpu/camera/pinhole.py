"""Pinhole camera models (with and without K1 radial distortion).

Re-design of ``/root/reference/cv-pinhole/src/lib.rs`` as batched JAX ops.
``calibrate`` maps pixel keypoints ``(..., 2)`` to unit bearings ``(..., 3)``;
``uncalibrate`` inverts it, returning ``(keypoint, valid_mask)`` since
bearings behind the camera have no pixel (lib.rs:134-141).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass


def _normalize(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


@pytree_dataclass
class CameraIntrinsics:
    """Focals / principal point / skew (lib.rs:32-84)."""

    focals: jnp.ndarray  # (..., 2)
    principal_point: jnp.ndarray  # (..., 2)
    skew: jnp.ndarray  # (...,)

    @classmethod
    def identity(cls, dtype=jnp.float64):
        return cls(
            focals=jnp.ones((2,), dtype),
            principal_point=jnp.zeros((2,), dtype),
            skew=jnp.zeros((), dtype),
        )

    @classmethod
    def from_values(cls, fx, fy, cx, cy, skew=0.0, dtype=jnp.float64):
        return cls(
            focals=jnp.array([fx, fy], dtype),
            principal_point=jnp.array([cx, cy], dtype),
            skew=jnp.asarray(skew, dtype),
        )

    def matrix(self) -> jnp.ndarray:
        """3x3 K matrix (lib.rs:78-84)."""
        fx, fy = self.focals[..., 0], self.focals[..., 1]
        cx, cy = self.principal_point[..., 0], self.principal_point[..., 1]
        skew = jnp.broadcast_to(self.skew, fx.shape)
        zero, one = jnp.zeros_like(fx), jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, skew, cx], axis=-1),
                jnp.stack([zero, fy, cy], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )

    def calibrate(self, point: jnp.ndarray) -> jnp.ndarray:
        """Pixel ``(..., 2)`` -> unit bearing ``(..., 3)`` (lib.rs:108-116)."""
        centered = point - self.principal_point
        y = centered[..., 1] / self.focals[..., 1]
        x = (centered[..., 0] - self.skew * y) / self.focals[..., 0]
        return _normalize(jnp.stack([x, y, jnp.ones_like(x)], axis=-1))

    def uncalibrate(self, bearing: jnp.ndarray):
        """Bearing -> (pixel ``(..., 2)``, valid mask) (lib.rs:134-141)."""
        valid = bearing[..., 2] > 0
        z = jnp.where(bearing[..., 2] == 0, jnp.ones_like(bearing[..., 2]), bearing[..., 2])
        px = bearing[..., 0] / z
        py = bearing[..., 1] / z
        y = py * self.focals[..., 1]
        x = px * self.focals[..., 0] + self.skew * py
        kp = jnp.stack([x, y], axis=-1) + self.principal_point
        return kp, valid


@pytree_dataclass
class CameraIntrinsicsK1Distortion:
    """Pinhole + single radial distortion coefficient K1 (lib.rs:150-240)."""

    simple_intrinsics: CameraIntrinsics
    k1: jnp.ndarray

    @classmethod
    def new(cls, simple_intrinsics: CameraIntrinsics, k1):
        return cls(simple_intrinsics=simple_intrinsics, k1=jnp.asarray(k1))

    def calibrate(self, point: jnp.ndarray) -> jnp.ndarray:
        """Undistort ``p' = p / (1 + k1 r^2)`` then normalize (lib.rs:191-202)."""
        si = self.simple_intrinsics
        centered = point - si.principal_point
        y = centered[..., 1] / si.focals[..., 1]
        x = (centered[..., 0] - si.skew * y) / si.focals[..., 0]
        r2 = x * x + y * y
        f = 1.0 + self.k1 * r2
        return _normalize(jnp.stack([x / f, y / f, jnp.ones_like(x)], axis=-1))

    def uncalibrate(self, bearing: jnp.ndarray):
        """Closed-form quadratic re-distortion (lib.rs:224-239)."""
        si = self.simple_intrinsics
        valid = bearing[..., 2] > 0
        z = jnp.where(bearing[..., 2] == 0, jnp.ones_like(bearing[..., 2]), bearing[..., 2])
        ux = bearing[..., 0] / z
        uy = bearing[..., 1] / z
        u2 = ux * ux + uy * uy
        k1 = self.k1
        denom = 2.0 * k1 * u2
        denom = jnp.where(denom == 0, jnp.ones_like(denom), denom)
        r2_mul_k1 = -(2.0 * k1 * u2 + jnp.sqrt(1.0 - 4.0 * k1 * u2) - 1.0) / denom
        r2_mul_k1 = jnp.where(self.k1 * u2 == 0, jnp.zeros_like(r2_mul_k1), r2_mul_k1)
        scale = 1.0 + r2_mul_k1
        dx, dy = ux * scale, uy * scale
        y = dy * si.focals[..., 1]
        x = dx * si.focals[..., 0] + si.skew * dy
        kp = jnp.stack([x, y], axis=-1) + si.principal_point
        return kp, valid


def pose_reprojection_error(pose, a: jnp.ndarray, b: jnp.ndarray):
    """Reprojection error (in focal lengths) of a match under a relative pose
    (cv-pinhole/src/lib.rs:314-346).

    ``pose``: CameraToCamera A->B (Isometry3); ``a``/``b``: unit bearings.
    Triangulates with LinearEigen and returns ``(errors (..., 2, 2), ok)``
    where errors[..., 0, :] / [..., 1, :] are the reprojection residuals in
    cameras A and B, and ``ok`` masks cheirality/triangulation failures.
    """
    from ..triangulate import triangulate_relative

    point, ok = triangulate_relative(pose, a, b)
    a_norm = a[..., :2] / a[..., 2:3]
    b_norm = b[..., :2] / b[..., 2:3]
    bearing_a = point[..., :3]
    ok = ok & (bearing_a[..., 2] > 0)
    za = jnp.where(bearing_a[..., 2] == 0, 1.0, bearing_a[..., 2])
    reproject_a = bearing_a[..., :2] / za[..., None]
    point_b = pose.transform(point)
    bearing_b = point_b[..., :3]
    ok = ok & (bearing_b[..., 2] > 0)
    zb = jnp.where(bearing_b[..., 2] == 0, 1.0, bearing_b[..., 2])
    reproject_b = bearing_b[..., :2] / zb[..., None]
    errors = jnp.stack([a_norm - reproject_a, b_norm - reproject_b], axis=-2)
    return errors, ok


def average_pose_reprojection_error(pose, a: jnp.ndarray, b: jnp.ndarray):
    """Mean of the two reprojection error norms (lib.rs:348-372)."""
    errors, ok = pose_reprojection_error(pose, a, b)
    avg = 0.5 * jnp.sum(jnp.linalg.norm(errors, axis=-1), axis=-1)
    return avg, ok


@pytree_dataclass
class CameraSpecification:
    """Manufacturer-style sensor spec -> intrinsics helper (lib.rs:250-284)."""

    pixels: jnp.ndarray  # (..., 2)
    pixel_dimensions: jnp.ndarray  # (..., 2)

    @classmethod
    def from_sensor(cls, pixels, sensor_dimensions):
        pixels = jnp.asarray(pixels)
        sensor_dimensions = jnp.asarray(sensor_dimensions)
        return cls(pixels=pixels, pixel_dimensions=sensor_dimensions / pixels)

    @classmethod
    def from_sensor_square(cls, pixels, sensor_width):
        pixels = jnp.asarray(pixels)
        pw = sensor_width / pixels[..., 0]
        return cls(pixels=pixels, pixel_dimensions=jnp.stack([pw, pw], axis=-1))

    def intrinsics_centered(self, focal) -> CameraIntrinsics:
        # NOTE: replicates the reference exactly (lib.rs:278-284), which
        # centers on pixel_dimensions rather than the pixel COUNT — almost
        # certainly a latent bug there (principal point should be
        # pixels/2 - 0.5), but kept for behavioral parity.
        pp = self.pixel_dimensions / 2.0 - 0.5
        focal = jnp.asarray(focal, pp.dtype)
        return CameraIntrinsics(
            focals=jnp.stack([focal, focal], axis=-1),
            principal_point=pp,
            skew=jnp.zeros_like(focal),
        )
