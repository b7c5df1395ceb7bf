"""Epipolar gradient/loss kernels — the analytic heart of the optimizers.

Re-design of ``/root/reference/cv-geom/src/epipolar.rs`` as batched jnp
functions.  Every Option/None in the reference becomes a zeros/mask: a failed
triangulation contributes a zero gradient (epipolar.rs:121-160 uses
``unwrap_or_else(Vector3::zeros)`` the same way).

A se(3) tangent is a pair ``(translation (..., 3), rotation (..., 3))``; the
NaN guard of ``Se3TangentSpace::new`` (so3.rs:23-29) is applied by
:func:`tangent_new`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _nan_to_zero_vec(v: jnp.ndarray) -> jnp.ndarray:
    """Zero the whole 3-vector when any component is NaN (so3.rs:23-29)."""
    bad = jnp.any(jnp.isnan(v), axis=-1, keepdims=True)
    return jnp.where(bad, 0.0, v)


def tangent_new(translation: jnp.ndarray, rotation: jnp.ndarray):
    """``Se3TangentSpace::new`` with its NaN guards."""
    return _nan_to_zero_vec(translation), _nan_to_zero_vec(rotation)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def two_view_same_space_triangulate_sine_l1(t, a, b):
    """Angular-L1-corrected midpoint triangulation (epipolar.rs:9-53).

    ``t``: translation from B to A; ``a``/``b``: unit bearings with A as the
    origin.  Returns ``(point (..., 3), ok (...,))``.
    """
    cross_a = jnp.cross(a, t)
    cross_a_norm = jnp.linalg.norm(cross_a, axis=-1)
    na = cross_a / cross_a_norm[..., None]
    cross_b = jnp.cross(b, t)
    cross_b_norm = jnp.linalg.norm(cross_b, axis=-1)
    nb = cross_b / cross_b_norm[..., None]
    use_a = (cross_a_norm < cross_b_norm)[..., None]
    new_a = _normalize(a - _dot(a, nb)[..., None] * nb)
    new_b = _normalize(b - _dot(b, na)[..., None] * na)
    a_c = jnp.where(use_a, new_a, a)
    b_c = jnp.where(use_a, b, new_b)

    z = jnp.cross(a_c, b_c)
    w = _dot(z, z) / _dot(z, jnp.cross(t, b_c))
    hp = jnp.concatenate([a_c, w[..., None]], axis=-1)
    # Projective normalization (sign flip for w >= 0).
    hp = jnp.where(hp[..., 3:4] < 0, -hp, hp)
    bearing = _normalize(hp[..., :3])
    finite = jnp.all(jnp.isfinite(hp), axis=-1)
    cheir = (_dot(bearing, a_c) >= 0) & (_dot(bearing, b_c) >= 0)
    w_safe = jnp.where(hp[..., 3] == 0, jnp.inf, hp[..., 3])
    point = bearing / w_safe[..., None]
    ok = finite & cheir & jnp.all(jnp.isfinite(point), axis=-1)
    return jnp.where(ok[..., None], point, 0.0), ok


def two_view_rotation_gradient(t, a, b):
    """Cross of the normalized epipolar-plane normals (epipolar.rs:56-71)."""
    cross_a = jnp.cross(a, t)
    cross_b = jnp.cross(b, t)
    return jnp.cross(_normalize(cross_b), _normalize(cross_a))


def three_view_gradients(c, f, ftoc, s, stoc):
    """The core three-view BA gradient (epipolar.rs:85-166).

    Inputs are bearings/translations in the center camera's frame:
    ``c``/``f``/``s`` bearings, ``ftoc``/``stoc`` translations from the
    center camera to the first/second cameras.

    Returns ``((t1, r1), (t2, r2))`` — the se(3) tangents for the first and
    second poses, with the reference's 2/3-1/3 edge weighting.
    """
    stof = stoc - ftoc

    rot_cf = two_view_rotation_gradient(ftoc, c, f)
    rot_cs = two_view_rotation_gradient(stoc, c, s)
    rot_fs = two_view_rotation_gradient(stof, f, s)
    rot_sf = -rot_fs

    first_rotation = rot_cf * (2.0 / 3.0) + rot_sf * (1.0 / 3.0)
    second_rotation = rot_cs * (2.0 / 3.0) + rot_fs * (1.0 / 3.0)

    p_f, ok_f = two_view_same_space_triangulate_sine_l1(-stoc, c, s)
    pf = p_f - ftoc
    trans_f = pf - _dot(pf, f)[..., None] * f
    trans_f = jnp.where(ok_f[..., None], trans_f, 0.0)

    p_s, ok_s = two_view_same_space_triangulate_sine_l1(-ftoc, c, f)
    ps = p_s - stoc
    trans_s = ps - _dot(ps, s)[..., None] * s
    trans_s = jnp.where(ok_s[..., None], trans_s, 0.0)

    p_c, ok_c = two_view_same_space_triangulate_sine_l1(-stof, f, s)
    pc = p_c + ftoc
    trans_c = _dot(pc, c)[..., None] * c - pc
    trans_c = jnp.where(ok_c[..., None], trans_c, 0.0)

    first_translation = trans_f * (2.0 / 3.0) + trans_c * (1.0 / 3.0)
    second_translation = trans_s * (2.0 / 3.0) + trans_c * (1.0 / 3.0)

    return (
        tangent_new(first_translation, first_rotation),
        tangent_new(second_translation, second_rotation),
    )


def point_gradient(translation, b):
    """Gradient translating a point towards a camera ray (epipolar.rs:174-179)."""
    return translation - _dot(translation, b)[..., None] * b


def world_pose_gradient(translation, b):
    """PnP pose tangent for one landmark (epipolar.rs:188-193).

    ``translation``: camera-frame vector from optical center to the point;
    ``b``: the observed bearing.  Returns ``(translation_grad, rotation_grad)``.
    """
    projected = _dot(translation, b)[..., None] * b
    translation_gradient = projected - translation
    rotation_gradient = jnp.cross(_normalize(translation), b)
    return tangent_new(translation_gradient, rotation_gradient)


def loss(translation, a, b):
    """|sine| of the angle between the two epipolar planes, with the NaN /
    cheirality fallback to 1.0 (epipolar.rs:197-233)."""
    cross_a = jnp.cross(a, translation)
    ca2 = _dot(cross_a, cross_a)
    cross_b = jnp.cross(b, translation)
    cb2 = _dot(cross_b, cross_b)
    res_a = jnp.abs(_dot(a, cross_b) / jnp.sqrt(cb2))
    res_b = jnp.abs(_dot(b, cross_a) / jnp.sqrt(ca2))
    residual = jnp.where(ca2 < cb2, res_a, res_b)
    bad = jnp.isnan(residual) | (_dot(a, b) < 0)
    return jnp.where(bad, 1.0, residual)
