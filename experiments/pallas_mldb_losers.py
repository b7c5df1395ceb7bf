"""Measured-LOSER Pallas sample-selection kernels (retired from the library).

Round-4 device verdicts (docs/perf-notes.md "Describe-stage attack" /
"session 4"):

* ``select_samples_epatch`` — per-keypoint ELEMENT-offset patch DMA.
  IMPOSSIBLE on this Mosaic: mixed Element/Blocked block dims are rejected,
  and all-Element offsets must be tile-aligned (sublane 8, lane 128).  Kept
  as the record of the attempt.
* ``select_samples_tiles`` (G=1) — fused cut+select via four
  scalar-prefetched plane-quadrant blocks per keypoint: composed extract
  52.4 ms vs 38.2 for 'pgather' (per-step overhead x 4096 steps x 2 calls).
* ``select_samples_tiles8`` (G=8, 32 quadrant specs/step) — 41.9 ms:
  the 2x-wide window gathers offset the saved cut; block reuse never
  triggers across the strided per-keypoint quadrant refs.

All three are bit-exact against the library paths and stay exercised by
equivalence tests (tests/test_fast_extractor.py imports this module, which
registers the 'ptiles' and 'pepatch' describe modes with
``cv_tpu.akaze.descriptors.EXTERNAL_MODES``).

Workload reference: ``/root/reference/akaze/src/descriptors.rs:102-202``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cv_tpu.akaze import descriptors as desc
from cv_tpu.akaze.descriptors import (
    _mldb_pack,
    _orientation_from_samples,
    mldb_unique_tables,
    orientation_table,
    round_half_away,
)
from cv_tpu.akaze.pallas_mldb import G, P


def _select_kernel_epatch(
    lvl_ref, y0_ref, x0_ref,  # scalar-prefetch (K,) i32
    relx_ref, rely_ref,       # (1, G, NS) patch-relative, in [0, P)
    *rest, c, ns, c0, g,
):
    """Per-keypoint patches arrive as ELEMENT-offset DMA blocks — the cut
    happens in the BlockSpec, not in XLA gathers or in-kernel selects; the
    sample selection is the proven per-tile gather chain of
    ``pallas_mldb._select_kernel_gather`` (1.47 us/kp on the v5e)."""
    patches = rest[:g]
    out_ref = rest[g]
    for j in range(g):
        for cc in range(ns // P):
            rx = relx_ref[0, j, cc * P : (cc + 1) * P]  # (P,) on lanes
            ry = rely_ref[0, j, cc * P : (cc + 1) * P]
            rx_b = jnp.broadcast_to(rx[None, :], (P, P))
            q = ry // 8
            r_b = jnp.broadcast_to((ry % 8)[None, :], (8, P))
            qmask = (
                jax.lax.broadcasted_iota(jnp.int32, (P // 8, 8, P), 0)
                == q[None, None, :]
            )
            for ch in range(c0, c):
                p = patches[j][0, ch]  # (P, P)
                u = jnp.take_along_axis(p, rx_b, axis=1)
                w = jnp.sum(
                    jnp.where(qmask, u.reshape(P // 8, 8, P), 0.0), axis=0
                )
                v = jnp.take_along_axis(w, r_b, axis=0)
                out_ref[j, ch - c0, cc * P : (cc + 1) * P] = v[0]


@partial(jax.jit, static_argnames=("interpret", "c0", "g"))
def select_samples_epatch(
    planes: jnp.ndarray,  # (L, C, Hp, Wp) padded plane stack
    lvl: jnp.ndarray,  # (K,) i32 plane index
    y0: jnp.ndarray,  # (K,) i32 patch-origin ELEMENT offsets (0 <= y0 <= Hp-P)
    x0: jnp.ndarray,  # (K,) i32
    rel_x: jnp.ndarray,  # (K, NS) i32 in [0, P), patch-relative
    rel_y: jnp.ndarray,  # (K, NS) i32
    interpret: bool = False,
    c0: int = 0,
    g: int = G,
) -> jnp.ndarray:
    """vals[k, c - c0, s] = planes[lvl[k], c, y0[k] + rel_y[k, s],
    x0[k] + rel_x[k, s]] — fused patch-cut + sample-select where the cut is
    a per-keypoint ELEMENT-offset block DMA (``pl.Element``): no pre-cut
    patch buffer, no XLA row gathers (the 18.6 ms wall at the bench shape),
    and none of the 2x-wide window selects that sank the tile-quadrant
    variants (the DMA lands the exact 128x128 patch).  Bit-exact f32.
    """
    l, c, hp, wp = planes.shape
    k = lvl.shape[0]
    ns = rel_x.shape[1]
    assert ns % P == 0, ns
    assert k % g == 0, (k, g)
    interpret = interpret or jax.default_backend() == "cpu"

    def patch(j):
        return pl.BlockSpec(
            (1, c, pl.Element(P), pl.Element(P)),
            lambda i, lvl_r, y0_r, x0_r, j=j: (
                lvl_r[i * g + j], 0, y0_r[i * g + j], x0_r[i * g + j]
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k // g,),
        in_specs=[
            pl.BlockSpec(
                (1, g, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [patch(j) for j in range(g)],
        out_specs=pl.BlockSpec(
            (g, c - c0, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_select_kernel_epatch, c=c, ns=ns, c0=c0, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c - c0, ns), jnp.float32),
        interpret=interpret,
    )(
        lvl, y0, x0,
        rel_x.reshape(k // g, g, ns), rel_y.reshape(k // g, g, ns),
        *([planes] * g),
    )


def _select_kernel_tiles(
    lvl_ref, ty_ref, tx_ref,  # scalar-prefetch (K,) i32
    relx_ref, rely_ref,       # (1, NS) window-relative, in [0, 256)
    q00_ref, q01_ref, q10_ref, q11_ref,  # (1, C, P, P) plane quadrants
    out_ref,                  # (1, C - c0, NS)
    *, c, ns, c0,
):
    """Per-keypoint sample selection straight from the padded plane stack.

    The 256x256 sampling window is the four (128, 128) plane quadrants
    anchored at the keypoint's tile (ty, tx) — Blocked block indices from
    scalar-prefetched per-keypoint tables, so Pallas pipelines (and, for
    tile-sorted keypoints, SKIPS) the quadrant DMAs; no pre-cut patch
    buffer exists at all.  The round-3 per-tile gather decomposition
    extends to the 2x2 window: lane gather per quadrant column pair +
    32-band masked reduce + sublane gather, samples on lanes throughout.
    """
    for cc in range(ns // P):
        rx = relx_ref[0, 0, cc * P : (cc + 1) * P]  # (P,) lanes, [0, 256)
        ry = rely_ref[0, 0, cc * P : (cc + 1) * P]
        right = rx >= P
        rx_l = jnp.where(right, rx - P, rx)
        rx_b = jnp.broadcast_to(rx_l[None, :], (P, P))
        bottom = ry >= P
        ry_l = jnp.where(bottom, ry - P, ry)
        q = ry_l // 8
        r_b = jnp.broadcast_to((ry_l % 8)[None, :], (8, P))
        qmask = (
            jax.lax.broadcasted_iota(jnp.int32, (P // 8, 8, P), 0)
            == q[None, None, :]
        )
        for ch in range(c0, c):
            # Horizontal select within each vertical half, then vertical.
            def half(top_ref, bot_ref):
                pt = top_ref[0, ch]
                pb = bot_ref[0, ch]
                ut = jnp.take_along_axis(pt, rx_b, axis=1)
                ub = jnp.take_along_axis(pb, rx_b, axis=1)
                u = jnp.where(bottom[None, :], ub, ut)  # (P, P)
                w = jnp.sum(
                    jnp.where(qmask, u.reshape(P // 8, 8, P), 0.0), axis=0
                )
                return jnp.take_along_axis(w, r_b, axis=0)[0]  # (P,)

            v_left = half(q00_ref, q10_ref)
            v_right = half(q01_ref, q11_ref)
            v = jnp.where(right, v_right, v_left)
            out_ref[0, ch - c0, cc * P : (cc + 1) * P] = v


@partial(jax.jit, static_argnames=("interpret", "c0"))
def select_samples_tiles(
    planes: jnp.ndarray,  # (L, C, Hp, Wp) padded plane stack, Hp/Wp % 128 == 0
    lvl: jnp.ndarray,  # (K,) i32 plane index
    ty: jnp.ndarray,  # (K,) i32 window tile row (window = [128ty, 128ty+256))
    tx: jnp.ndarray,  # (K,) i32 window tile col
    rel_x: jnp.ndarray,  # (K, NS) i32 in [0, 256), window-relative
    rel_y: jnp.ndarray,  # (K, NS) i32 in [0, 256)
    interpret: bool = False,
    c0: int = 0,
) -> jnp.ndarray:
    """vals[k, c - c0, s] = planes[lvl[k], c, 128*ty[k] + rel_y[k, s],
    128*tx[k] + rel_x[k, s]] — the fused patch-cut + sample-select.

    Callers should pass keypoints TILE-SORTED (by (lvl, ty, tx)): Pallas
    skips a quadrant's DMA when consecutive grid steps map the same block,
    so sorted keypoints pay each plane tile roughly once instead of four
    quadrant fetches per keypoint.  Bit-exact f32 (pure gathers).
    """
    l, c, hp, wp = planes.shape
    assert hp % P == 0 and wp % P == 0, (hp, wp)
    k = lvl.shape[0]
    ns = rel_x.shape[1]
    assert ns % P == 0, ns
    interpret = interpret or jax.default_backend() == "cpu"

    def quad(dy, dx):
        return pl.BlockSpec(
            (1, c, P, P),
            lambda i, lvl_r, ty_r, tx_r, dy=dy, dx=dx: (
                lvl_r[i], 0, ty_r[i] + dy, tx_r[i] + dx
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k,),
        in_specs=[
            # (K, 1, NS): the trailing two block dims equal the array dims,
            # satisfying the TPU block-shape tiling rule at G=1.
            pl.BlockSpec(
                (1, 1, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            quad(0, 0), quad(0, 1), quad(1, 0), quad(1, 1),
        ],
        out_specs=pl.BlockSpec(
            (1, c - c0, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_select_kernel_tiles, c=c, ns=ns, c0=c0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c - c0, ns), jnp.float32),
        interpret=interpret,
    )(
        lvl, ty, tx,
        rel_x[:, None, :], rel_y[:, None, :],
        planes, planes, planes, planes,
    )


def _select_kernel_tiles8(
    lvl_ref, ty_ref, tx_ref,
    relx_ref, rely_ref,  # (1, G, NS)
    *rest, c, ns, c0, g,
):
    """G keypoints per grid step, each with its own four scalar-prefetch-
    indexed plane quadrants (4G quadrant refs), amortizing the per-step
    overhead that made the G=1 variant lose to the patch-buffer path
    (52 vs 38 ms composed).  Tile-sorted keypoints make most of the 4G
    block fetches repeats of the previous step's, which Pallas skips."""
    quads = rest[: 4 * g]
    out_ref = rest[4 * g]
    for j in range(g):
        q00, q01, q10, q11 = quads[4 * j : 4 * j + 4]
        for cc in range(ns // P):
            rx = relx_ref[0, j, cc * P : (cc + 1) * P]
            ry = rely_ref[0, j, cc * P : (cc + 1) * P]
            right = rx >= P
            rx_l = jnp.where(right, rx - P, rx)
            rx_b = jnp.broadcast_to(rx_l[None, :], (P, P))
            bottom = ry >= P
            ry_l = jnp.where(bottom, ry - P, ry)
            q = ry_l // 8
            r_b = jnp.broadcast_to((ry_l % 8)[None, :], (8, P))
            qmask = (
                jax.lax.broadcasted_iota(jnp.int32, (P // 8, 8, P), 0)
                == q[None, None, :]
            )
            for ch in range(c0, c):
                def half(top_ref, bot_ref):
                    ut = jnp.take_along_axis(top_ref[0, ch], rx_b, axis=1)
                    ub = jnp.take_along_axis(bot_ref[0, ch], rx_b, axis=1)
                    u = jnp.where(bottom[None, :], ub, ut)
                    w = jnp.sum(
                        jnp.where(qmask, u.reshape(P // 8, 8, P), 0.0), axis=0
                    )
                    return jnp.take_along_axis(w, r_b, axis=0)[0]

                v = jnp.where(
                    right, half(q01, q11), half(q00, q10)
                )
                out_ref[j, ch - c0, cc * P : (cc + 1) * P] = v


@partial(jax.jit, static_argnames=("interpret", "c0", "g"))
def select_samples_tiles8(
    planes: jnp.ndarray,  # (L, C, Hp, Wp), Hp/Wp % 128 == 0
    lvl: jnp.ndarray,  # (K,) i32
    ty: jnp.ndarray,  # (K,) i32
    tx: jnp.ndarray,  # (K,) i32
    rel_x: jnp.ndarray,  # (K, NS) i32 in [0, 256)
    rel_y: jnp.ndarray,  # (K, NS) i32 in [0, 256)
    interpret: bool = False,
    c0: int = 0,
    g: int = G,
) -> jnp.ndarray:
    """G-keypoints-per-step variant of :func:`select_samples_tiles`."""
    l, c, hp, wp = planes.shape
    assert hp % P == 0 and wp % P == 0, (hp, wp)
    k = lvl.shape[0]
    assert k % g == 0, (k, g)
    ns = rel_x.shape[1]
    assert ns % P == 0, ns
    interpret = interpret or jax.default_backend() == "cpu"

    def quad(j, dy, dx):
        return pl.BlockSpec(
            (1, c, P, P),
            lambda i, lvl_r, ty_r, tx_r, j=j, dy=dy, dx=dx: (
                lvl_r[i * g + j], 0, ty_r[i * g + j] + dy, tx_r[i * g + j] + dx
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k // g,),
        in_specs=[
            pl.BlockSpec(
                (1, g, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [quad(j, dy, dx) for j in range(g) for dy in (0, 1) for dx in (0, 1)],
        out_specs=pl.BlockSpec(
            (g, c - c0, ns), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        partial(_select_kernel_tiles8, c=c, ns=ns, c0=c0, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c - c0, ns), jnp.float32),
        interpret=interpret,
    )(
        lvl, ty, tx,
        rel_x.reshape(k // g, g, ns), rel_y.reshape(k // g, g, ns),
        *([planes] * (4 * g)),
    )


def orient_mldb_ptiles(
    planes, lvl, width, height, xf, yf, scale, pattern_size
):
    """Fully-fused describe over :func:`select_samples_tiles8`: NO
    per-keypoint patch buffer (the retired 'ptiles' describe mode; device
    verdict: extract 41.9 ms vs 38.2 for 'pgather').  Outputs bit-identical
    to the library paths."""
    k_total = xf.shape[0]
    hmax, wmax = planes.shape[2], planes.shape[3]
    ht, wt = hmax // 128, wmax // 128
    p = 128
    # Patch anchor exactly as the chunked paths compute it, then the
    # enclosing 256-window tile (clamped so ty+1/tx+1 stay in range).
    y0 = jnp.clip(yf.astype(jnp.int32) - p // 2, 0, hmax - p)
    x0 = jnp.clip(xf.astype(jnp.int32) - p // 2, 0, wmax - p)
    ty = jnp.clip(y0 // p, 0, ht - 2)
    tx = jnp.clip(x0 // p, 0, wt - 2)

    # Tile-sort the keypoints (argsort is stable; the inverse permutation
    # restores caller order at the end).
    key = (lvl.astype(jnp.int64) * ht + ty) * wt + tx
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)

    def s(a):
        return a[perm]

    lvl_s, ty_s, tx_s = s(lvl), s(ty), s(tx)
    xf_s, yf_s, sc_s = s(xf), s(yf), s(scale)
    w_s, h_s = s(width), s(height)

    # Orientation samples (window-relative).
    di, dj, wt_g = (jnp.asarray(a) for a in orientation_table())
    ox = round_half_away(xf_s[:, None] + di[None, :] * sc_s[:, None]).astype(jnp.int32)
    oy = round_half_away(yf_s[:, None] + dj[None, :] * sc_s[:, None]).astype(jnp.int32)
    ox = jnp.clip(ox, 0, w_s[:, None] - 1)
    oy = jnp.clip(oy, 0, h_s[:, None] - 1)
    orel_x = jnp.clip(ox - tx_s[:, None] * p, 0, 2 * p - 1)
    orel_y = jnp.clip(oy - ty_s[:, None] * p, 0, 2 * p - 1)
    n_or = int(di.shape[0])
    pad_or = (-n_or) % p
    if pad_or:
        orel_x = jnp.pad(orel_x, ((0, 0), (0, pad_or)))
        orel_y = jnp.pad(orel_y, ((0, 0), (0, pad_or)))
    vo = select_samples_tiles8(
        planes, lvl_s, ty_s, tx_s, orel_x, orel_y, c0=1
    )[:, :, :n_or]  # (K, 2, n_or)
    res_x = wt_g[None, :] * vo[:, 0]
    res_y = wt_g[None, :] * vo[:, 1]
    angle_s = _orientation_from_samples(res_x, res_y)

    # M-LDB samples (need the angle).
    uk, ul, _, _ = mldb_unique_tables(pattern_size)
    ks = jnp.asarray(uk.astype(np.float32))
    ls = jnp.asarray(ul.astype(np.float32))
    co = jnp.cos(angle_s)[:, None]
    si = jnp.sin(angle_s)[:, None]
    sc = sc_s[:, None]
    sy = yf_s[:, None] + (ls[None, :] * co + ks[None, :] * si) * sc
    sx = xf_s[:, None] + (-ls[None, :] * si + ks[None, :] * co) * sc
    x1 = round_half_away(sx).astype(jnp.int32)
    y1 = round_half_away(sy).astype(jnp.int32)
    oob = (x1 < 0) | (x1 >= w_s[:, None]) | (y1 < 0) | (y1 >= h_s[:, None])
    ok_s = ~jnp.any(oob, axis=-1)
    x1 = jnp.clip(x1, 0, w_s[:, None] - 1)
    y1 = jnp.clip(y1, 0, h_s[:, None] - 1)
    rel_x = jnp.clip(x1 - tx_s[:, None] * p, 0, 2 * p - 1)
    rel_y = jnp.clip(y1 - ty_s[:, None] * p, 0, 2 * p - 1)
    ns = int(uk.shape[0])
    pad_ns = (-ns) % p
    if pad_ns:
        rel_x = jnp.pad(rel_x, ((0, 0), (0, pad_ns)))
        rel_y = jnp.pad(rel_y, ((0, 0), (0, pad_ns)))
    vals = select_samples_tiles8(
        planes, lvl_s, ty_s, tx_s, rel_x, rel_y
    )[:, :, :ns]  # (K, 3, ns)
    words_s = _mldb_pack(vals[:, 0], vals[:, 1], vals[:, 2], co, si, pattern_size)
    return words_s[inv], ok_s[inv], angle_s[inv]


def epatch_select(planes, lvl_c, y0_c, x0_c, rel_x, rel_y, c0=0):
    """'pepatch' select hook: pad ns to a lane multiple and run
    :func:`select_samples_epatch` (signature expected by
    ``descriptors.EXTERNAL_MODES['pepatch']``)."""
    ns_in = rel_x.shape[1]
    ns_pad = (-ns_in) % 128
    if ns_pad:
        rel_x = jnp.pad(rel_x, ((0, 0), (0, ns_pad)))
        rel_y = jnp.pad(rel_y, ((0, 0), (0, ns_pad)))
    vals = select_samples_epatch(planes, lvl_c, y0_c, x0_c, rel_x, rel_y, c0=c0)
    return vals[:, :, :ns_in]


# Importing this module is what makes the retired modes reachable: the
# library keeps only the winners (pallas_mldb.py), experiments and
# equivalence tests opt in explicitly.
desc.EXTERNAL_MODES["ptiles"] = orient_mldb_ptiles
desc.EXTERNAL_MODES["pepatch"] = epatch_select
