"""Pallas TPU kernels for the AKAZE hot paths (EXPERIMENTAL — not wired in).

Status: numerically exact (verified in interpreter mode and DMA-only on
TPU) but the per-keypoint dynamic-offset strided DMA runs ~3 orders of
magnitude below the bandwidth bound on this platform, so the XLA gather
path in akaze/fast.py remains the production path. See docs/perf-notes.md
for measurements and the round-2 plan.

XLA's gather runs at ~18 ns/index on TPU, which makes M-LDB descriptor
sampling (1241 samples x 3 planes per keypoint) the dominant cost of the
batched extractor.  :func:`mldb_sample` replaces it with a kernel that, per
group of 8 keypoints,

1. DMAs each keypoint's tile-aligned patch (136 x 256 per plane, Lt/Lx/Ly
   channel-major) from HBM into VMEM — all 24 copies in flight at once
   (Mosaic requires the DMA offsets to be tile-aligned: y0 % 8 == 0,
   x0 % 128 == 0, asserted via ``pl.multiple_of``), and
2. resolves the rotated-grid samples with a *factorized one-hot* selection:
   ``value[s] = onehot_row[s] @ patch @ onehot_col[s]`` — MXU matmuls + one
   VPU reduction instead of thousands of scalar gathers.  ``HIGHEST``
   precision keeps the selection bit-exact (the default TPU f32 dot rounds
   inputs to bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_H = 136  # 17 sublane tiles; covers sample offsets within [-58, +58]
PATCH_W = 256  # 2 lane tiles
GROUP = 8
CHANNELS = 3
MAX_SAMPLE_OFFSET = 58  # pattern_size * sqrt(2) * max scale + rounding


def _sample_kernel(plane_idx_ref, y0_ref, x0_ref, y1_ref, x1_ref,
                   planes_ref, out_ref, patch, sems):
    i = pl.program_id(0)
    ns = y1_ref.shape[1]

    def dma(j, c):
        kp = i * GROUP + j
        y0 = pl.multiple_of(y0_ref[kp], 8)
        x0 = pl.multiple_of(x0_ref[kp], 128)
        return pltpu.make_async_copy(
            planes_ref.at[
                plane_idx_ref[kp], c, pl.ds(y0, PATCH_H), pl.ds(x0, PATCH_W)
            ],
            patch.at[j, c],
            sems.at[j, c],
        )

    for j in range(GROUP):
        for c in range(CHANNELS):
            dma(j, c).start()
    for j in range(GROUP):
        for c in range(CHANNELS):
            dma(j, c).wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (ns, PATCH_H), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ns, PATCH_W), 1)
    for j in range(GROUP):
        kp = i * GROUP + j
        rel_y = y1_ref[j, :] - y0_ref[kp]
        rel_x = x1_ref[j, :] - x0_ref[kp]
        onehot_row = (rows == rel_y[:, None]).astype(jnp.float32)
        onehot_col = (cols == rel_x[:, None]).astype(jnp.float32)
        for c in range(CHANNELS):
            a = jnp.dot(
                onehot_row,
                patch[j, c],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (NS, PATCH_W)
            out_ref[j, c, :] = jnp.sum(a * onehot_col, axis=1)


def patch_origins(xf, yf, h_max: int, w_max: int):
    """Tile-aligned patch origins containing all samples of a keypoint at
    (xf, yf): y0 % 8 == 0, x0 % 128 == 0, samples within the patch for
    offsets up to +-MAX_SAMPLE_OFFSET."""
    y0 = jnp.clip(
        ((yf.astype(jnp.int32) - 68) // 8) * 8, 0, h_max - PATCH_H
    )
    x0 = jnp.clip(
        ((xf.astype(jnp.int32) - 64) // 128) * 128, 0, w_max - PATCH_W
    )
    return y0.astype(jnp.int32), x0.astype(jnp.int32)


def mldb_sample(planes, plane_idx, y0, x0, y1, x1, interpret=False):
    """Sample channel-major (Lt, Lx, Ly) planes at per-keypoint positions.

    planes: (L, 3, Hmax, Wmax) f32 — padded plane stack (frame x level),
      Hmax >= PATCH_H, Wmax >= PATCH_W.
    plane_idx/y0/x0: (K,) int32 — plane and tile-aligned patch origin (from
      :func:`patch_origins`).  K must be a multiple of 8.
    y1/x1: (K, NS) int32 — absolute rounded sample coordinates, inside the
      patch; NS must be a multiple of 128.

    Returns (K, 3, NS) f32 sampled values.
    """
    k, ns = y1.shape
    assert k % GROUP == 0 and ns % 128 == 0, (k, ns)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, ns), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, ns), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # planes stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (GROUP, CHANNELS, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((GROUP, CHANNELS, PATCH_H, PATCH_W), jnp.float32),
            pltpu.SemaphoreType.DMA((GROUP, CHANNELS)),
        ],
    )
    kernel = pl.pallas_call(
        _sample_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, CHANNELS, ns), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return kernel(plane_idx, y0, x0, y1, x1, planes)
