"""so(3) / se(3) Lie-algebra primitives.

TPU-native re-design of the reference's ``Skew3`` / ``Se3TangentSpace``
(``/root/reference/cv-core/src/so3.rs``).  Everything here is a pure,
shape-polymorphic ``jax.numpy`` function operating on trailing dimensions
``(..., 3)`` / ``(..., 3, 3)`` so it vmaps and jits freely in any dtype.

Conventions (matching the reference):

* ``so3_exp`` is the exponential map so(3) -> SO(3) (Rodrigues).
* ``so3_log`` is the log map SO(3) -> so(3) returning the scaled axis, with a
  NaN guard returning zeros (so3.rs:264-275 guards nalgebra NaNs the same way).
* An se(3) tangent is a pair ``(translation, rotation)`` of 3-vectors.  Its
  ``isometry`` is ``(R, R @ translation)`` with ``R = exp(rotation)`` — note
  this is the reference's convention (so3.rs:52-60), *not* the textbook SE(3)
  exponential (no V-matrix).
"""

from __future__ import annotations

import jax.numpy as jnp
from .smallmat import matmul as _mm, matvec as _mv


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (cross-product) matrix of ``w``: hat(w) @ v == w x v."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(mat: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`so3_hat`.  No symmetry check (so3.rs:169-174)."""
    return jnp.stack([mat[..., 2, 1], mat[..., 0, 2], mat[..., 1, 0]], axis=-1)


def so3_hat2(w: jnp.ndarray) -> jnp.ndarray:
    """hat(w) @ hat(w), computed directly (so3.rs:181-196)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    w11, w22, w33 = wx * wx, wy * wy, wz * wz
    w12, w13, w23 = wx * wy, wx * wz, wy * wz
    return jnp.stack(
        [
            jnp.stack([-w22 - w33, w12, w13], axis=-1),
            jnp.stack([w12, -w11 - w33, w23], axis=-1),
            jnp.stack([w13, w23, -w11 - w22], axis=-1),
        ],
        axis=-2,
    )


def so3_bracket(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lie bracket [a, b] = vee(hat(a) hat(b) - hat(b) hat(a))."""
    ha, hb = so3_hat(a), so3_hat(b)
    return so3_vee(_mm(ha, hb) - _mm(hb, ha))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation matrix from scaled axis (Rodrigues).

    Numerically safe at theta -> 0 via Taylor-series coefficients, mirroring
    the reference's small-angle branch (so3.rs:243-256).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta2 <= jnp.finfo(w.dtype).eps
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
    t2s = jnp.where(small, jnp.ones_like(theta2), theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.sqrt(t2s))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), w.shape[:-1] + (3, 3))
    return eye + a[..., None, None] * so3_hat(w) + b[..., None, None] * so3_hat2(w)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Log map: scaled axis from rotation matrix.

    Handles theta near 0 (Taylor) and theta near pi (diagonal extraction).
    NaN results are replaced by zeros, matching the reference's guard
    (so3.rs:264-275).
    """
    dtype = r.dtype
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Antisymmetric part: vee(R - R^T)/2 = sin(theta) * axis
    axis_sin = (
        jnp.stack(
            [
                r[..., 2, 1] - r[..., 1, 2],
                r[..., 0, 2] - r[..., 2, 0],
                r[..., 1, 0] - r[..., 0, 1],
            ],
            axis=-1,
        )
        * 0.5
    )
    sin_theta = jnp.linalg.norm(axis_sin, axis=-1)
    # atan2 is well-conditioned at theta -> 0 AND theta -> pi, unlike
    # arccos(trace), whose error blows up as 1/sin(theta) near pi.
    theta = jnp.arctan2(sin_theta, cos_theta)
    eps = jnp.finfo(dtype).eps
    near_pi = cos_theta < -1.0 + 16.0 * eps
    small = theta < jnp.sqrt(jnp.sqrt(eps))

    # Generic branch: w = theta / sin(theta) * axis_sin, Taylor for small theta.
    safe_sin = jnp.where(sin_theta == 0, jnp.ones_like(sin_theta), sin_theta)
    scale = jnp.where(
        small,
        1.0 + theta * theta / 6.0,
        theta / safe_sin,
    )
    w_generic = scale[..., None] * axis_sin

    # Near-pi branch, via the identity
    #   R + R^T + (1 - trace(R)) I = 2 (1 - cos theta) a a^T.
    # Take the column of a a^T with the largest diagonal (best-conditioned),
    # normalize to +-a, and sign it against the antisymmetric part (which
    # degenerates to 0 only at exactly pi, where either sign is valid).
    eye = jnp.eye(3, dtype=dtype)
    outer = r + jnp.swapaxes(r, -1, -2) + (1.0 - trace)[..., None, None] * eye
    diag = jnp.stack([outer[..., 0, 0], outer[..., 1, 1], outer[..., 2, 2]], axis=-1)
    col_idx = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(outer, col_idx[..., None, None], axis=-1)[..., 0]
    col_norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis_pi = col / jnp.where(col_norm == 0, 1.0, col_norm)
    sign = jnp.sign(jnp.sum(axis_pi * axis_sin, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    w_pi = theta[..., None] * axis_pi * sign

    w = jnp.where(near_pi[..., None], w_pi, w_generic)
    return jnp.where(jnp.isnan(w), jnp.zeros_like(w), w)


def tangent_isometry(translation: jnp.ndarray, rotation: jnp.ndarray):
    """``Se3TangentSpace.isometry`` (so3.rs:52-60): ``(R, R @ translation)``.

    Returns ``(R, t)`` where ``R = exp(rotation)`` and ``t = R @ translation``.
    """
    r = so3_exp(rotation)
    t = _mv(r, translation)
    return r, t


def tangent_l1(translation: jnp.ndarray, rotation: jnp.ndarray):
    """``Se3TangentSpace.l1`` (so3.rs:121-125): normalize both parts.

    A zero (or NaN-producing) part is mapped to zeros via the reference's
    NaN guard in ``Se3TangentSpace::new`` (so3.rs:23-29).
    """

    def _norm(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        out = v / n
        return jnp.where(jnp.isnan(out), jnp.zeros_like(out), out)

    return _norm(translation), _norm(rotation)
