"""Batched Lambda-Twist P3P (Persson & Nordberg, ECCV 2018).

Re-design of ``/root/reference/lambda-twist/src/lib.rs`` as a closed-form,
branch-free batched solver: every data-dependent branch of the reference
(cubic-root initialization cases, quadratic root validity, Gauss-Newton
early-exit, degenerate configurations) becomes a masked ``where``, so a
RANSAC pass solves thousands of P3P problems in one vectorized call.

Returns up to 4 ``WorldToCamera`` poses per problem with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..core import smallmat

from ..core import projective
from ..core.pose import WorldToCamera

MIN_SAMPLES = 3
MODELS_PER_SAMPLE = 4
GAUSS_NEWTON_ITERATIONS = 5


def _cube_root(b, c, d):
    """Most-stable real root of r^3 + b r^2 + c r + d (lib.rs:458-506)."""
    diff = b * b - 3.0 * c
    has_stationary = diff >= 0.0
    v = jnp.sqrt(jnp.maximum(diff, 0.0))
    t1 = (-b - v) / 3.0
    k1 = ((t1 + b) * t1 + c) * t1 + d
    r_t1 = t1 - jnp.sqrt(jnp.maximum(-k1 / (3.0 * t1 + b), 0.0))
    t2 = (-b + v) / 3.0
    k2 = ((t2 + b) * t2 + c) * t2 + d
    r_t2 = t2 + jnp.sqrt(jnp.maximum(-k2 / (3.0 * t2 + b), 0.0))
    r_stat = jnp.where(k1 > 0.0, r_t1, r_t2)
    # Monotonic case: start at the inflection point, nudged off a flat spot.
    r_mono = -b / 3.0
    flat = jnp.abs((3.0 * r_mono + 2.0 * b) * r_mono + c) < 1e-4
    r_mono = jnp.where(flat, r_mono + 1.0, r_mono)
    r0 = jnp.where(has_stationary, r_stat, r_mono)

    # 7 unconditional Newton steps, then up to 43 guarded ones (":491-505");
    # fori_loops keep the compiled program two bodies long.
    def newton(_, r0):
        fx = ((r0 + b) * r0 + c) * r0 + d
        fpx = (3.0 * r0 + 2.0 * b) * r0 + c
        return r0 - fx / fpx

    def newton_guarded(_, r0):
        fx = ((r0 + b) * r0 + c) * r0 + d
        fpx = (3.0 * r0 + 2.0 * b) * r0 + c
        return r0 - jnp.where(jnp.abs(fx) > 1e-13, fx / fpx, 0.0)

    r0 = jax.lax.fori_loop(0, 7, newton, r0)
    r0 = jax.lax.fori_loop(0, 43, newton_guarded, r0)
    return r0


def _root2real(b, c):
    """Real roots of r^2 + b r + c, numerically stable form (lib.rs:423-435).

    Returns (real, r1, r2)."""
    disc = b * b - 4.0 * c
    real = disc >= 0.0
    y = jnp.sqrt(jnp.maximum(disc, 0.0))
    neg = b < 0.0
    r1 = jnp.where(neg, 0.5 * (-b + y), 2.0 * c / (-b + y))
    r2 = jnp.where(neg, 0.5 * (-b - y), 2.0 * c / (-b - y))
    half = 0.5 * b
    r1 = jnp.where(real, r1, half)
    r2 = jnp.where(real, r2, half)
    return real, r1, r2


def _eigen_singular(m):
    """Closed-form eigen decomposition of a singular symmetric 3x3
    (lib.rs:510-554). ``m``: (..., 3, 3). Returns (vectors (..., 3, 3),
    values (..., 2))."""
    m11, m12, m13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m22, m23, m33 = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    m21, m31, m32 = m[..., 1, 0], m[..., 2, 0], m[..., 2, 1]
    # Null vector = cross of two rows (column-major x[i] indexing in the
    # reference corresponds to these products).
    v3 = jnp.stack(
        [
            m21 * m32 - m31 * m22,
            m31 * m12 - m32 * m11,
            m22 * m11 - m21 * m12,
        ],
        axis=-1,
    )
    v3 = v3 / jnp.linalg.norm(v3, axis=-1, keepdims=True)

    x12_sqr = m12 * m12
    b = -m11 - m22 - m33
    c = -x12_sqr - m13 * m13 - m23 * m23 + m11 * (m22 + m33) + m22 * m33
    _, e1, e2 = _root2real(b, c)
    swap = jnp.abs(e1) < jnp.abs(e2)
    e1, e2 = jnp.where(swap, e2, e1), jnp.where(swap, e1, e2)

    mx0011 = -m11 * m22
    prec_0 = m12 * m23 - m13 * m22
    prec_1 = m12 * m13 - m11 * m23

    def vec(e):
        tmp = 1.0 / (e * (m11 + m22) + mx0011 - e * e + x12_sqr)
        a1 = -(e * m13 + prec_0) * tmp
        a2 = -(e * m23 + prec_1) * tmp
        rnorm = 1.0 / jnp.sqrt(a1 * a1 + a2 * a2 + 1.0)
        return jnp.stack([a1 * rnorm, a2 * rnorm, rnorm], axis=-1)

    v1, v2 = vec(e1), vec(e2)
    vectors = jnp.stack([v1, v2, v3], axis=-1)  # columns
    values = jnp.stack([e1, e2], axis=-1)
    return vectors, values


def _gauss_newton_refine(lmbda, a12, a13, a23, b12, b13, b23):
    """Depth refinement with residual-increase guard (lib.rs:361-412)."""

    def residual(l1, l2, l3):
        r1 = l1 * l1 + l2 * l2 + b12 * l1 * l2 - a12
        r2 = l1 * l1 + l3 * l3 + b13 * l1 * l3 - a13
        r3 = l2 * l2 + l3 * l3 + b23 * l2 * l3 - a23
        return r1, r2, r3

    l1, l2, l3 = lmbda[..., 0], lmbda[..., 1], lmbda[..., 2]
    r1, r2, r3 = residual(l1, l2, l3)
    l1n = jnp.abs(r1) + jnp.abs(r2) + jnp.abs(r3)
    # ``stopped`` latches both the small-residual break and the
    # residual-increase break of the reference loop.
    stopped = l1n < 1e-10
    for _ in range(GAUSS_NEWTON_ITERATIONS):
        dr1dl1 = 2.0 * l1 + b12 * l2
        dr1dl2 = 2.0 * l2 + b12 * l1
        dr2dl1 = 2.0 * l1 + b13 * l3
        dr2dl3 = 2.0 * l3 + b13 * l1
        dr3dl2 = 2.0 * l2 + b23 * l3
        dr3dl3 = 2.0 * l3 + b23 * l2
        det = 1.0 / (-dr1dl1 * dr2dl3 * dr3dl2 - dr1dl2 * dr2dl1 * dr3dl3)
        n1 = -dr2dl3 * dr3dl2 * r1 + -dr1dl2 * dr3dl3 * r2 + dr1dl2 * dr2dl3 * r3
        n2 = -dr2dl1 * dr3dl3 * r1 + dr1dl1 * dr3dl3 * r2 + -dr1dl1 * dr2dl3 * r3
        n3 = dr2dl1 * dr3dl2 * r1 + -dr1dl1 * dr3dl2 * r2 + -dr1dl2 * dr2dl1 * r3
        l1_new = l1 - det * n1
        l2_new = l2 - det * n2
        l3_new = l3 - det * n3
        r1n, r2n, r3n = residual(l1_new, l2_new, l3_new)
        l1n_new = jnp.abs(r1n) + jnp.abs(r2n) + jnp.abs(r3n)
        worse = l1n_new > l1n
        accept = ~stopped & ~worse
        l1 = jnp.where(accept, l1_new, l1)
        l2 = jnp.where(accept, l2_new, l2)
        l3 = jnp.where(accept, l3_new, l3)
        r1 = jnp.where(accept, r1n, r1)
        r2 = jnp.where(accept, r2n, r2)
        r3 = jnp.where(accept, r3n, r3)
        l1n = jnp.where(accept, l1n_new, l1n)
        stopped = stopped | worse | (l1n < 1e-10)
    return jnp.stack([l1, l2, l3], axis=-1)


def _closest_rotation(m):
    """Nearest proper rotation (polar decomposition via SVD).

    The reference uses nalgebra's iterative ``Rotation3::from_matrix_eps``
    (lib.rs:307-315); the SVD polar factor is its convergence point.
    """
    from ..ops.eigen import svd3

    u, _, vt = svd3(m)
    det = jnp.linalg.det(smallmat.matmul(u, vt))
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return smallmat.matmul(u * fix[..., None, :], vt)


def estimate(bearings: jnp.ndarray, world_points: jnp.ndarray):
    """Solve P3P for batches of 3-point samples.

    ``bearings``: (..., 3, 3) unit bearings (one row per correspondence);
    ``world_points``: (..., 3, 4) projective world points.

    Returns ``(WorldToCamera with batch (..., 4), valid (..., 4))``.
    """
    finite = projective.is_finite(world_points) & (
        jnp.abs(world_points[..., 3]) > 0
    )
    sample_ok = jnp.all(finite, axis=-1)
    wps = projective.point(world_points)  # (..., 3, 3)
    wps = jnp.where(sample_ok[..., None, None], wps, 0.0)
    y1, y2, y3 = bearings[..., 0, :], bearings[..., 1, :], bearings[..., 2, :]
    x1, x2, x3 = wps[..., 0, :], wps[..., 1, :], wps[..., 2, :]

    d12 = x1 - x2
    d13 = x1 - x3
    d23 = x2 - x3
    d12xd13 = jnp.cross(d12, d13)

    a12 = jnp.sum(d12 * d12, axis=-1)
    a13 = jnp.sum(d13 * d13, axis=-1)
    a23 = jnp.sum(d23 * d23, axis=-1)
    c12 = jnp.sum(y1 * y2, axis=-1)
    c23 = jnp.sum(y2 * y3, axis=-1)
    c31 = jnp.sum(y3 * y1, axis=-1)
    blob = c12 * c23 * c31 - 1.0
    s12_sqr = 1.0 - c12 * c12
    s23_sqr = 1.0 - c23 * c23
    s31_sqr = 1.0 - c31 * c31
    b12, b13, b23 = -2.0 * c12, -2.0 * c31, -2.0 * c23

    p3 = a13 * (a23 * s31_sqr - a13 * s23_sqr)
    p2 = (
        2.0 * blob * a23 * a13
        + a13 * (2.0 * a12 + a13) * s23_sqr
        + a23 * (a23 - a12) * s31_sqr
    )
    p1 = (
        a23 * (a13 - a23) * s12_sqr
        - a12 * a12 * s23_sqr
        - 2.0 * a12 * (blob * a23 + a13 * s23_sqr)
    )
    p0 = a12 * (a12 * s23_sqr - a23 * s12_sqr)

    g = _cube_root(p2 / p3, p1 / p3, p0 / p3)

    d0_00 = a23 * (1.0 - g)
    d0_01 = -(a23 * c12)
    d0_02 = a23 * c31 * g
    d0_11 = a23 - a12 + a13 * g
    d0_12 = -c23 * (a13 * g - a12)
    d0_22 = g * (a13 - a23) - a12
    d0 = jnp.stack(
        [
            jnp.stack([d0_00, d0_01, d0_02], axis=-1),
            jnp.stack([d0_01, d0_11, d0_12], axis=-1),
            jnp.stack([d0_02, d0_12, d0_22], axis=-1),
        ],
        axis=-2,
    )
    eig_vectors, eig_values = _eigen_singular(d0)
    eigen_ratio = jnp.sqrt(jnp.maximum(-eig_values[..., 1] / eig_values[..., 0], 0.0))

    ev = eig_vectors

    def lambdas_for_ratio(ratio):
        # Quadratic coefficients, eq. (15) (lib.rs:206-216).
        w2 = 1.0 / (ratio * ev[..., 0, 1] - ev[..., 0, 0])
        w0 = w2 * (ev[..., 1, 0] - ratio * ev[..., 1, 1])
        w1 = w2 * (ev[..., 2, 0] - ratio * ev[..., 2, 1])
        a = 1.0 / ((a13 - a12) * w1 * w1 - a12 * b13 * w1 - a12)
        bq = a * (a13 * b12 * w1 - a12 * b13 * w0 - 2.0 * w0 * w1 * (a12 - a13))
        cq = a * ((a13 - a12) * w0 * w0 + a13 * b12 * w0 + a13)
        disc_ok = bq * bq - 4.0 * cq >= 0.0
        _, tau1, tau2 = _root2real(bq, cq)

        def depths(tau):
            # eq. (16) (lib.rs:220-231).
            d = a23 / (tau * (b23 + tau) + 1.0)
            d_ok = d > 0.0
            l2 = jnp.sqrt(jnp.maximum(d, 0.0))
            l3 = tau * l2
            l1 = w0 * l2 + w1 * l3
            ok = disc_ok & (tau > 0.0) & d_ok & (l1 >= 0.0)
            return jnp.stack([l1, l2, l3], axis=-1), ok

        return depths(tau1), depths(tau2)

    (lam_a, ok_a), (lam_b, ok_b) = lambdas_for_ratio(eigen_ratio)
    (lam_c, ok_c), (lam_d, ok_d) = lambdas_for_ratio(-eigen_ratio)
    lambdas = jnp.stack([lam_a, lam_b, lam_c, lam_d], axis=-2)  # (..., 4, 3)
    lam_ok = jnp.stack([ok_a, ok_b, ok_c, ok_d], axis=-1)  # (..., 4)

    # X matrix (world-side triad), shared across the 4 candidates.
    x_mat = jnp.stack([d12, d13, d12xd13], axis=-1)  # (..., 3, 3) columns
    x_det = jnp.linalg.det(x_mat)
    x_ok = jnp.abs(x_det) > 0
    x_inv = jnp.linalg.inv(
        jnp.where(x_ok[..., None, None], x_mat, jnp.eye(3, dtype=x_mat.dtype))
    )

    lam = _gauss_newton_refine(
        lambdas,
        a12[..., None],
        a13[..., None],
        a23[..., None],
        b12[..., None],
        b13[..., None],
        b23[..., None],
    )

    ry1 = lam[..., 0:1] * y1[..., None, :]
    ry2 = lam[..., 1:2] * y2[..., None, :]
    ry3 = lam[..., 2:3] * y3[..., None, :]
    yd1 = ry1 - ry2
    yd2 = ry1 - ry3
    yd1xd2 = jnp.cross(yd1, yd2)
    y_mat = jnp.stack([yd1, yd2, yd1xd2], axis=-1)  # (..., 4, 3, 3)
    rot = smallmat.matmul(y_mat, x_inv[..., None, :, :])
    rot = _closest_rotation(rot)
    trans = ry1 - smallmat.matvec(rot, x1[..., None, :])

    valid = lam_ok & x_ok[..., None] & sample_ok[..., None]
    valid &= jnp.all(jnp.isfinite(rot), axis=(-1, -2)) & jnp.all(
        jnp.isfinite(trans), axis=-1
    )
    return WorldToCamera(rotation=rot, translation=trans), valid
