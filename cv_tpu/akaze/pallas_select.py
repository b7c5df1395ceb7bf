"""Pallas TPU kernel: per-keypoint patch sampling by one-hot MXU selection.

The descriptor stage must evaluate ~1.2k irregularly-placed samples per
keypoint.  XLA's gather costs ~18 ns/index (HBM-bound) and the pure-XLA
one-hot formulation (descriptors.orient_mldb_onehot) materializes a
(keypoints, samples, channels, 128) f32 intermediate in HBM — ~16 GB of
traffic per KITTI batch.  This kernel keeps the whole selection in VMEM:

grid = one step per keypoint; the 2x2 neighborhood of 128x128 plane blocks
around the keypoint streams in via block specs whose index maps read
scalar-prefetched block coordinates (Pallas double-buffers these DMAs
against compute).  In VMEM the kernel assembles the 256x256 window, cuts a
136-row band with one 8-aligned sublane slice (Mosaic requires provable
8-alignment; 136 = 128 + 8 absorbs the alignment slack), splits it into
three exact bf16 terms, and resolves all samples with one MXU row-selection
per term plus a VPU column-selection — transpose-free on purpose, Mosaic
transposes measured slower than the extra matmul width:

    t[n, (c, w)] = sum_h onehot_row[n, h] * band[c, h, w]   (MXU, bf16x3)
    val[c, n]    = sum_w onehot_col[n, w] * t[n, (c, w)]    (VPU)

bf16 one-hots are exact (0/1), and f32 = bf16_1 + bf16_2 + bf16_3 is an
exact split, so the selected values are bit-identical to a gather.

Reference being accelerated: the per-keypoint sample loops of
``akaze/src/descriptors.rs:102-177`` and ``scale_space_extrema.rs:229-288``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # plane block side
PS = 136  # band height: 128 + 8 sublanes of alignment slack
W2 = 2 * B  # window width


def _select_kernel(
    # scalar prefetch
    lvl_ref, yb_ref, xb_ref, yb1_ref, xb1_ref, dy_ref,
    # inputs
    blk00, blk01, blk10, blk11,  # (1, 3, B, B) plane blocks
    rel_x_ref,  # (1, 1, NSP) i32 window-relative sample columns [0, 256)
    rel_y_ref,  # (1, 1, NSP) i32 band-relative sample rows [0, 136)
    # output
    out_ref,  # (1, 3, NSP) f32 selected values
    # scratch
    window_ref,  # (3, 2B, 2B) f32
    band_ref,  # (PS, 3 * 2B) f32: channels side by side on the lane axis
):
    i = pl.program_id(0)
    dy = pl.multiple_of(dy_ref[i], 8)

    window_ref[:, :B, :B] = blk00[0]
    window_ref[:, :B, B:] = blk01[0]
    window_ref[:, B:, :B] = blk10[0]
    window_ref[:, B:, B:] = blk11[0]
    for c in range(3):
        band_ref[:, c * W2 : (c + 1) * W2] = window_ref[c, pl.ds(dy, PS), :]

    nsp = rel_x_ref.shape[2]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (nsp, PS), 1)
    ohr = (iota_h == rel_y_ref[0, 0][:, None]).astype(jnp.bfloat16)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (nsp, W2), 1)
    ohc = (iota_w == rel_x_ref[0, 0][:, None]).astype(jnp.float32)

    band = band_ref[...]
    p1 = band.astype(jnp.bfloat16)
    r1 = band - p1.astype(jnp.float32)
    p2 = r1.astype(jnp.bfloat16)
    r2 = r1 - p2.astype(jnp.float32)
    p3 = r2.astype(jnp.bfloat16)
    t = jax.lax.dot_general(
        ohr, p1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    t += jax.lax.dot_general(
        ohr, p2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    t += jax.lax.dot_general(
        ohr, p3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (nsp, 3 * W2)

    for c in range(3):
        out_ref[0, c, :] = jnp.sum(t[:, c * W2 : (c + 1) * W2] * ohc, axis=1)


def _origins(hp, wp, yc, xc):
    """Patch origins: y 8-aligned for the band slice, x block-aligned."""
    y0 = (jnp.clip(yc - 64, 0, hp - PS) // 8) * 8
    x0 = (jnp.clip(xc - 64, 0, wp - B) // B) * B
    return y0, x0


@partial(jax.jit, static_argnames=("interpret",))
def patch_select(planes, lvl, yc, xc, rel_x, rel_y, interpret: bool = False):
    """Select ``planes[lvl[k], c, y0[k] + rel_y, x0[k] + rel_x]`` per sample.

    ``planes``: (L, 3, Hp, Wp) f32 with Hp, Wp multiples of 128.
    ``lvl``: (K,) i32 plane index per keypoint.
    ``yc``/``xc``: (K,) i32 patch-center coordinates.
    ``rel_x``/``rel_y``: (K, NSP) i32 coordinates relative to the patch
    origin (:func:`patch_origins`): rel_y in [0, 136), rel_x in [0, 256).
    Valid keypoints' samples always fit: AKAZE samples span at most
    center+-58, the y origin sits in [center-71, center-64] and the x
    origin in [center-191, center-64] (or pinned at a plane edge).

    Returns ``(K, 3, NSP)`` f32 selected values.
    """
    k = lvl.shape[0]
    hp, wp = planes.shape[2], planes.shape[3]
    nsp = rel_x.shape[1]
    y0, x0 = _origins(hp, wp, yc, xc)
    yb = y0 // B
    xb = x0 // B
    yb1 = jnp.minimum(yb + 1, hp // B - 1)
    xb1 = jnp.minimum(xb + 1, wp // B - 1)
    dy = y0 - yb * B  # multiple of 8, <= 120, so dy + PS <= 2B

    def spec(ym, xm):
        return pl.BlockSpec(
            (1, 3, B, B),
            index_map=lambda i, lvl, yb, xb, yb1, xb1, dy: (
                lvl[i],
                0,
                ym(yb, yb1, i),
                xm(xb, xb1, i),
            ),
            memory_space=pltpu.VMEM,
        )

    lo = lambda a, b, i: a[i]  # noqa: E731
    hi = lambda a, b, i: b[i]  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k,),
        in_specs=[
            spec(lo, lo),
            spec(lo, hi),
            spec(hi, lo),
            spec(hi, hi),
            pl.BlockSpec(
                (1, 1, nsp),
                index_map=lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nsp),
                index_map=lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, nsp), index_map=lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, 2 * B, 2 * B), jnp.float32),
            pltpu.VMEM((PS, 3 * W2), jnp.float32),
        ],
    )
    vals = pl.pallas_call(
        _select_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 3, nsp), jnp.float32),
        interpret=interpret,
    )(
        lvl, yb, xb, yb1, xb1, dy,
        planes, planes, planes, planes,
        rel_x[:, None, :], rel_y[:, None, :],
    )
    return vals


def patch_origins(planes_shape, yc, xc):
    """The patch origins ``patch_select`` uses, for building rel coords."""
    return _origins(planes_shape[2], planes_shape[3], yc, xc)
