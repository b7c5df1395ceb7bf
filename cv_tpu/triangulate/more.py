"""The remaining triangulator family (cv-geom/src/triangulation.rs).

* :func:`sine_l1` — Linear-Eigen init + epipolar gradient descent
  (triangulation.rs:164-276)
* :func:`relative_dlt` — H&Z algorithm-12 two-view DLT (":280-363")
* :func:`mean_mean` — skew-line average (":365-442")
* :func:`angular_l1` / :func:`angular_linf` — closed-form optimal two-view
  triangulation based on angular errors (":470-606")

All batched; every function returns ``(point, ok)``: homogeneous ``(..., 4)``
points in the invariant form plus the finite/cheirality mask that stands in
for the reference's Options.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import projective
from ..core.pose import Isometry3
from ..geom import epipolar
from ..ops import eigen
from ..core import smallmat
from .linear_eigen import triangulate_observations as linear_eigen_observations


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def sine_l1(
    poses: Isometry3,
    bearings: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    epsilon: float = 1e-12,
    max_iterations: int = 1000,
    optimization_rate: float = 1.0,
):
    """Linear-Eigen init then gradient descent on the epipolar point
    gradient (triangulation.rs:229-276). Batched ``lax.while_loop`` with
    per-element convergence masks."""
    init, ok = linear_eigen_observations(poses, bearings, valid)
    # Points at infinity skip refinement and are returned as-is (":240-244").
    at_inf = init[..., 3] == 0.0
    point0 = jnp.where(at_inf[..., None], 0.0, projective.point(init))

    inv = poses.inverse()
    centers = inv.translation  # (..., V, 3) camera centers in world
    world_bearings = inv.rotate(bearings)
    if valid is None:
        count = jnp.full(point0.shape[:-1], bearings.shape[-2], point0.dtype)
        vmask = jnp.ones(bearings.shape[:-1], bool)
    else:
        count = jnp.sum(valid, axis=-1).astype(point0.dtype)
        vmask = valid
    scale = optimization_rate / count
    eps2 = epsilon * epsilon

    def cond(state):
        _, done, it = state
        return (it < max_iterations) & ~jnp.all(done)

    def body(state):
        point, done, it = state
        grad = epipolar.point_gradient(
            centers - point[..., None, :], world_bearings
        )
        grad = jnp.where(vmask[..., None], grad, 0.0)
        delta = scale[..., None] * jnp.sum(grad, axis=-2)
        new_point = point + delta
        converged = _dot(delta, delta) / _dot(new_point, new_point) < eps2
        point = jnp.where(done[..., None], point, new_point)
        return point, done | converged, it + 1

    done0 = at_inf | ~ok
    point, _, _ = jax.lax.while_loop(cond, body, (point0, done0, jnp.int32(0)))
    refined = projective.from_point(point)
    return jnp.where(at_inf[..., None], init, refined), ok


def relative_dlt(pose: Isometry3, a: jnp.ndarray, b: jnp.ndarray):
    """Two-view DLT, H&Z algorithm 12 (triangulation.rs:322-363).

    ``pose``: CameraToCamera A->B; returns the point in A's frame.
    """
    h = pose.homogeneous()  # (..., 4, 4)
    zero = jnp.zeros_like(a[..., 0])
    row0 = jnp.stack([-a[..., 2], zero, a[..., 0], zero], axis=-1)
    row1 = jnp.stack([zero, -a[..., 2], a[..., 1], zero], axis=-1)
    row2 = b[..., 0:1] * h[..., 2, :] - b[..., 2:3] * h[..., 0, :]
    row3 = b[..., 1:2] * h[..., 2, :] - b[..., 2:3] * h[..., 1, :]
    design = jnp.stack([row0, row1, row2, row3], axis=-2)
    # Right null vector via the batched Jacobi 4x4 symmetric eigensolver
    # (smallest eigenvector of A^T A) — the general jnp.linalg.svd allocates
    # large workspaces on TPU and is ~15x slower at this size.
    ata = smallmat.matmul_tn(design, design)
    _, v = eigen.eigh4(ata)  # ascending eigenvalues
    point = projective.from_homogeneous(v[..., :, 0])
    finite = projective.is_finite(point)
    bearing = projective.bearing(point)
    b_in_a = smallmat.matvec_t(pose.rotation, b)
    cheir = (_dot(bearing, a) >= 0) & (_dot(bearing, b_in_a) >= 0)
    return point, finite & cheir


def mean_mean(
    poses: Isometry3, bearings: jnp.ndarray, valid: jnp.ndarray | None = None
):
    """Mean-camera/mean-bearing skew-line average (triangulation.rs:390-442)."""
    inv = poses.inverse()
    centers = inv.translation  # (..., V, 3)
    wb = inv.rotate(bearings)
    if valid is None:
        total = jnp.full(centers.shape[:-2], centers.shape[-2], centers.dtype)
        vmask = jnp.ones(centers.shape[:-1], bool)
    else:
        total = jnp.sum(valid, axis=-1).astype(centers.dtype)
        vmask = valid
    msk = vmask[..., None]
    avg_center = jnp.sum(jnp.where(msk, centers, 0.0), axis=-2) / total[..., None]
    avg_bearing = _normalize(jnp.sum(jnp.where(msk, wb, 0.0), axis=-2))

    trans = avg_center[..., None, :] - centers
    q = jnp.cross(jnp.broadcast_to(avg_bearing[..., None, :], wb.shape), wb)
    d = _dot(q / _dot(q, q)[..., None], jnp.cross(wb, trans))
    avg_proj = jnp.sum(jnp.where(vmask, d, 0.0), axis=-1) / total

    w = 1.0 / avg_proj
    hp = jnp.concatenate(
        [avg_bearing + avg_center * w[..., None], w[..., None]], axis=-1
    )
    point = projective.from_homogeneous(hp)
    finite = projective.is_finite(point)
    cheir = _dot(wb, point[..., None, :3]) >= 0
    cheir = jnp.where(vmask, cheir, True)
    return point, finite & jnp.all(cheir, axis=-1)


def _angular_common(pose: Isometry3, a: jnp.ndarray, b: jnp.ndarray, corrected):
    """Shared tail of the angular triangulators (triangulation.rs:508-530)."""
    a_c, b_c, translation = corrected
    z = jnp.cross(b_c, a_c)
    w = _dot(z, z) / _dot(z, jnp.cross(translation, a_c))
    hp = jnp.concatenate([b_c, w[..., None]], axis=-1)
    point = projective.from_homogeneous(hp)
    finite = projective.is_finite(point)
    bearing = projective.bearing(point)
    cheir = (_dot(bearing, a_c) >= 0) & (_dot(bearing, b_c) >= 0)
    return point, finite & cheir


def angular_l1(pose: Isometry3, a: jnp.ndarray, b: jnp.ndarray):
    """Closed-form optimal two-view L1 angular triangulation
    (triangulation.rs:470-530). Returns the point in camera A's frame."""
    # Flip to the paper's frame: triangulate in the second camera of the
    # inverted pose (":489-492").
    inv = pose.inverse()
    a_p, b_p = b, a
    a_t = inv.rotate(a_p)
    translation = inv.translation
    nt = _normalize(translation)
    cross_a = jnp.cross(a_t, nt)
    ca = jnp.linalg.norm(cross_a, axis=-1)
    na = cross_a / ca[..., None]
    cross_b = jnp.cross(b_p, nt)
    cb = jnp.linalg.norm(cross_b, axis=-1)
    nb = cross_b / cb[..., None]
    use_a = (ca < cb)[..., None]
    new_a = _normalize(a_t - _dot(a_t, nb)[..., None] * nb)
    new_b = _normalize(b_p - _dot(b_p, na)[..., None] * na)
    a_c = jnp.where(use_a, new_a, a_t)
    b_c = jnp.where(use_a, b_p, new_b)
    return _angular_common(pose, a, b, (a_c, b_c, translation))


def angular_linf(pose: Isometry3, a: jnp.ndarray, b: jnp.ndarray):
    """L-infinity variant: one common correction normal
    (triangulation.rs:556-606)."""
    inv = pose.inverse()
    a_p, b_p = b, a
    a_t = inv.rotate(a_p)
    translation = inv.translation
    nt = _normalize(translation)
    na = jnp.cross(a_t + b_p, nt)
    na2 = _dot(na, na)
    nb = jnp.cross(a_t - b_p, nt)
    nb2 = _dot(nb, nb)
    n = jnp.where(
        (na2 > nb2)[..., None],
        na / jnp.sqrt(na2)[..., None],
        nb / jnp.sqrt(nb2)[..., None],
    )
    a_c = _normalize(a_t - _dot(a_t, n)[..., None] * n)
    b_c = _normalize(b_p - _dot(b_p, n)[..., None] * n)
    return _angular_common(pose, a, b, (a_c, b_c, translation))
