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

    for _ in range(sweeps):
        for p, q in pairs:
            a, v = rotate(a, v, p, q)

    w = jnp.stack([a[..., i, i] for i in range(n)], axis=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


def eigh4(a: jnp.ndarray, sweeps: int = 6):
    """Symmetric 4x4 batch eigendecomposition (see :func:`eigh_small`)."""
    return eigh_small(a, sweeps=sweeps)
