"""Exact-f32 small-matrix contractions for the geometry kernels.

The TPU MXU rounds f32 matmul inputs to bf16 at default precision, and a
dot_general whose trailing dims are 3 or 4 wide materializes in MXU-tiled
layout (lane padding 3 -> 128: a ~40x HBM blowup at RANSAC batch sizes).
Measured on the two-view DLT: 2e-2 error through ``@`` vs 2e-5 through these
elementwise forms; the BASELINE pose tolerance is 1e-4.

Every contraction here is an explicit multiply + small-axis reduction: XLA
lowers them to fused VPU mul-add chains — full f32 accuracy, native layout,
zero MXU involvement.  Use these for every 3x3/3x4/4x4-shaped product in the
geometry path; big contractions (descriptors, Hamming) manage their own
precision explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp


def matvec(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``m @ v`` for ``(..., i, j) x (..., j) -> (..., i)``."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def matvec_t(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``m^T @ v`` for ``(..., j, i) x (..., j) -> (..., i)``."""
    return jnp.sum(m * v[..., :, None], axis=-2)


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a @ b`` for ``(..., i, k) x (..., k, j) -> (..., i, j)``."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def matmul_tn(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a^T @ b`` for ``(..., k, i) x (..., k, j) -> (..., i, j)``."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)


def outer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``a b^T`` for ``(..., i) x (..., j) -> (..., i, j)``."""
    return a[..., :, None] * b[..., None, :]
