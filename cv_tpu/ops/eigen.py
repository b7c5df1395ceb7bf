"""Batched small symmetric eigensolvers (cyclic Jacobi).

``jnp.linalg.eigh`` on TPU lowers to a general-purpose decomposition with
large HBM temporaries — it dominates RANSAC scoring, where the
``CameraToCamera`` residual solves one 4x4 symmetric eigenproblem per
(model, match) pair (pose.rs:249-296), and Linear-Eigen triangulation.
Cyclic Jacobi on a 4x4 is a handful of fused VPU rotations: ~machine
precision after a few sweeps, no workspace, fully batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

@partial(jax.jit, static_argnames=("sweeps",))
def eigh_small(a: jnp.ndarray, sweeps: int = 6):
    """Eigendecomposition of symmetric ``(..., N, N)`` matrices (N small).

    Returns ``(eigenvalues (..., N) ascending, eigenvectors (..., N, N))``
    with eigenvectors in columns, matching ``jnp.linalg.eigh``.  The cyclic
    sweep is fully unrolled: intended for N <= ~10 (4x4 DLT designs, the
    9x9 epipolar normal matrix).
    """
    n = a.shape[-1]
    pairs = tuple((p, q) for p in range(n) for q in range(p + 1, n))
    dtype = a.dtype
    v = jnp.broadcast_to(jnp.eye(n, dtype=dtype), a.shape)
    v = jnp.array(v)

    def rotate(a, v, p, q):
        app = a[..., p, p]
        aqq = a[..., q, q]
        apq = a[..., p, q]
        # Jacobi angle annihilating a[p, q]: theta = atan2(2 apq, aqq - app)/2
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c = jnp.cos(theta)[..., None]
        s = jnp.sin(theta)[..., None]
        # A <- G^T A G with G the (p, q) Givens rotation.
        col_p = a[..., :, p]
        col_q = a[..., :, q]
        a = a.at[..., :, p].set(c * col_p - s * col_q)
        a = a.at[..., :, q].set(s * col_p + c * col_q)
        row_p = a[..., p, :]
        row_q = a[..., q, :]
        a = a.at[..., p, :].set(c * row_p - s * row_q)
        a = a.at[..., q, :].set(s * row_p + c * row_q)
        # Accumulate eigenvectors: V <- V G.
        vp = v[..., :, p]
        vq = v[..., :, q]
        v = v.at[..., :, p].set(c * vp - s * vq)
        v = v.at[..., :, q].set(s * vp + c * vq)
        return a, v

    def sweep(_, av):
        a, v = av
        for p, q in pairs:
            a, v = rotate(a, v, p, q)
        return a, v

    # fori_loop over sweeps keeps the compiled program one sweep long —
    # the fully-unrolled form made large consensus programs (P3P sampling +
    # solver + scoring) exceed the TPU compiler's limits.
    a, v = jax.lax.fori_loop(0, sweeps, sweep, (a, v))

    w = jnp.stack([a[..., i, i] for i in range(n)], axis=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


def eigh4(a: jnp.ndarray, sweeps: int = 6):
    """Symmetric 4x4 batch eigendecomposition (see :func:`eigh_small`)."""
    return eigh_small(a, sweeps=sweeps)


@partial(jax.jit, static_argnames=("sweeps",))
def svd3(e: jnp.ndarray, sweeps: int = 8):
    """SVD of ``(..., 3, 3)`` batches via Jacobi on E^T E.

    Returns ``(u, s, vt)`` with singular values descending, matching
    ``jnp.linalg.svd``.  The left vector of the smallest singular value is
    completed by a cross product when that value is (near) zero — exactly
    the rank-2 essential-matrix case this exists for.
    """
    b = jnp.sum(e[..., :, :, None] * e[..., :, None, :], axis=-3)
    w, v = eigh_small(b, sweeps=sweeps)  # ascending
    # Descending order.
    w = w[..., ::-1]
    v = v[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    ev = jnp.sum(e[..., :, :, None] * v[..., None, :, :], axis=-2)  # columns: s_i * u_i
    s0 = s[..., 0:1]
    tol = jnp.finfo(e.dtype).eps ** 0.5 * jnp.maximum(s0, 1e-30)
    safe = jnp.where(s <= tol, 1.0, s)
    u = ev / safe[..., None, :]
    u0, u1 = u[..., :, 0], u[..., :, 1]
    u2_cross = jnp.cross(u0, u1)
    u2 = jnp.where((s[..., 2] <= tol[..., 0])[..., None], u2_cross, u[..., :, 2])
    u = u.at[..., :, 2].set(u2)
    # Degenerate rank<2 batches: fall back to orthonormal completion of u1.
    u1_ok = s[..., 1] > tol[..., 0]
    alt = jnp.cross(u0, jnp.stack([jnp.ones_like(s[..., 0]),
                                   jnp.zeros_like(s[..., 0]),
                                   jnp.zeros_like(s[..., 0])], axis=-1))
    alt_norm = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(u0, jnp.stack([jnp.zeros_like(s[..., 0]),
                                    jnp.ones_like(s[..., 0]),
                                    jnp.zeros_like(s[..., 0])], axis=-1))
    alt = jnp.where(alt_norm > 0.1, alt, alt2)
    alt = alt / jnp.linalg.norm(alt, axis=-1, keepdims=True)
    u = u.at[..., :, 1].set(jnp.where(u1_ok[..., None], u[..., :, 1], alt))
    u = u.at[..., :, 2].set(
        jnp.where(u1_ok[..., None], u[..., :, 2], jnp.cross(u0, u[..., :, 1]))
    )
    return u, s, jnp.swapaxes(v, -1, -2)
