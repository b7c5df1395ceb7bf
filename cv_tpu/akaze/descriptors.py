"""Keypoint orientation and M-LDB binary descriptors (device side).

Re-design of ``/root/reference/akaze/src/scale_space_extrema.rs:157-288``
(orientation) and ``descriptors.rs`` (M-LDB).  The reference's per-keypoint
sample loops become batched gathers over static offset tables: every keypoint
gathers its 109 orientation samples and 1241 descriptor samples in one
vectorized pass, and the 486 binary comparisons are a static pair-index
table -> bit-pack.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# Retired sample-select strategies (the round-4 measured losers 'ptiles' /
# 'pepatch') register here when experiments/pallas_mldb_losers.py is
# imported; the library itself ships only the winners.
EXTERNAL_MODES: dict = {}

# ---------------------------------------------------------------------------
# Static tables
# ---------------------------------------------------------------------------

# 7x7 Gaussian weight table (scale_space_extrema.rs:162-226).
GAUSS25 = np.array(
    [
        [0.02546481, 0.02350698, 0.01849125, 0.01239505, 0.00708017, 0.00344629, 0.00142946],
        [0.02350698, 0.02169968, 0.01706957, 0.01144208, 0.00653582, 0.00318132, 0.00131956],
        [0.01849125, 0.01706957, 0.01342740, 0.00900066, 0.00514126, 0.00250252, 0.00103800],
        [0.01239505, 0.01144208, 0.00900066, 0.00603332, 0.00344629, 0.00167749, 0.00069579],
        [0.00708017, 0.00653582, 0.00514126, 0.00344629, 0.00196855, 0.00095820, 0.00039744],
        [0.00344629, 0.00318132, 0.00250252, 0.00167749, 0.00095820, 0.00046640, 0.00019346],
        [0.00142946, 0.00131956, 0.00103800, 0.00069579, 0.00039744, 0.00019346, 0.00008024],
    ],
    dtype=np.float32,
)


@lru_cache(maxsize=None)
def orientation_table():
    """(di, dj, weight) for the 109-sample disc (scale_space_extrema.rs:242-253)."""
    dis, djs, ws = [], [], []
    for j in range(-6, 7):
        for i in range(-6, 7):
            if i * i + j * j < 36:
                dis.append(i)
                djs.append(j)
                ws.append(GAUSS25[abs(j)][abs(i)])
    return (
        np.array(dis, np.float32),
        np.array(djs, np.float32),
        np.array(ws, np.float32),
    )


@lru_cache(maxsize=None)
def orientation_windows():
    """The 42 sliding-window start angles, accumulated in f32 exactly like
    the reference's ``ang1 += 0.15`` loop (scale_space_extrema.rs:256-287)."""
    angs = []
    ang1 = np.float32(0.0)
    two_pi = np.float32(2.0) * np.float32(np.pi)
    while ang1 < two_pi:
        angs.append(ang1)
        ang1 = np.float32(ang1 + np.float32(0.15))
    ang1s = np.array(angs, np.float32)
    pi3 = np.float32(np.pi) / np.float32(3.0)
    ang2s = np.where(
        ang1s + pi3 > two_pi, ang1s - np.float32(5.0) * pi3, ang1s + pi3
    ).astype(np.float32)
    return ang1s, ang2s


@lru_cache(maxsize=None)
def mldb_tables(pattern_size: int = 10):
    """Static M-LDB sampling + comparison tables (descriptors.rs:102-202).

    Returns:
      samples: (n_samples, 3) int32 rows (cell_index, k, l) across all 3 grid
        levels (cells are numbered consecutively: 4 + 9 + 16 = 29).
      cell_counts: (29,) number of samples per cell.
      comparisons: (486, 3) int32 rows (cell_i, cell_j, channel) in exact
        ``dpos`` order (level-major, then channel, then pair).
    """
    size_mult = [1.0, 2.0 / 3.0, 1.0 / 2.0]
    samples = []
    cell_counts = []
    comparisons = []
    cell_base = 0
    for lvl, mult in enumerate(size_mult):
        count = (lvl + 2) * (lvl + 2)
        step = int(np.ceil(pattern_size * mult))
        cell = cell_base
        n_axis = 0
        for i in range(-pattern_size, pattern_size, step):
            n_axis += 1
        assert n_axis * n_axis == count, (lvl, n_axis, count)
        for i in range(-pattern_size, pattern_size, step):
            for j in range(-pattern_size, pattern_size, step):
                for k in range(i, i + step):
                    for l in range(j, j + step):
                        samples.append((cell, k, l))
                cell_counts.append(step * step)
                cell += 1
        for ch in range(3):
            for a in range(count):
                for b in range(a + 1, count):
                    comparisons.append((cell_base + a, cell_base + b, ch))
        cell_base += count
    return (
        np.array(samples, np.int32),
        np.array(cell_counts, np.int32),
        np.array(comparisons, np.int32),
    )


@lru_cache(maxsize=None)
def mldb_unique_tables(pattern_size: int = 10):
    """Deduplicated M-LDB sampling tables.

    The reference samples every (cell, k, l) triple (descriptors.rs:102-177),
    but the sampled position depends only on (k, l) — and the three grid
    levels' (k, l) ranges overlap almost entirely (union = 21x21 = 441 unique
    offsets vs 1241 raw samples).  Sampling each unique offset once and
    aggregating cells with a static 0/1 membership matrix does 2.8x less
    selection work with the same per-cell term sets.

    The unique table is (k, l)-lexicographic, which preserves each cell's
    within-cell accumulation order (cells are (k-major, l-minor) rectangles).

    Returns:
      uk, ul: (U,) int32 unique sample offsets.
      member: (n_cells, U) float32 0/1 cell membership.
      cell_counts: (n_cells,) int32.
    """
    samples, cell_counts, _ = mldb_tables(pattern_size)
    pairs = sorted({(int(k), int(l)) for _, k, l in samples})
    index = {p: i for i, p in enumerate(pairs)}
    n_cells = int(cell_counts.shape[0])
    member = np.zeros((n_cells, len(pairs)), np.float32)
    for cell, k, l in samples:
        member[cell, index[(int(k), int(l))]] += 1.0
    assert member.max() == 1.0  # each cell samples each offset once
    uk = np.array([p[0] for p in pairs], np.int32)
    ul = np.array([p[1] for p in pairs], np.int32)
    return uk, ul, member, cell_counts


def round_half_away(x: jnp.ndarray) -> jnp.ndarray:
    """Rust ``f32::round`` semantics (round half away from zero); jnp.round
    is half-to-even, which would disagree on exact .5 samples."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def _atan2_cv(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """OpenCV-equivalent atan2 in [0, 2pi) (scale_space_extrema.rs:236-239)."""
    two_pi = jnp.float32(2.0 * np.pi)
    return jnp.mod(jnp.arctan2(y, x) + two_pi, two_pi)


# ---------------------------------------------------------------------------
# Shared math (gather-source independent)
# ---------------------------------------------------------------------------


def _orientation_from_samples(res_x: jnp.ndarray, res_y: jnp.ndarray) -> jnp.ndarray:
    """Sliding-window dominant orientation from weighted samples (K, 109)."""
    angs = _atan2_cv(res_y, res_x)
    ang1s, ang2s = (jnp.asarray(a) for a in orientation_windows())  # (42,)
    two_pi = jnp.float32(2.0 * np.pi)
    a1 = ang1s[None, :, None]
    a2 = ang2s[None, :, None]
    ang = angs[:, None, :]
    in_window = ((a1 < a2) & (a1 < ang) & (ang < a2)) | (
        (a2 < a1) & (((ang > 0) & (ang < a2)) | ((ang > a1) & (ang < two_pi)))
    )  # (K, 42, 109)
    sum_x = jnp.sum(jnp.where(in_window, res_x[:, None, :], 0.0), axis=-1)
    sum_y = jnp.sum(jnp.where(in_window, res_y[:, None, :], 0.0), axis=-1)
    val = sum_x * sum_x + sum_y * sum_y  # (K, 42)
    best = jnp.argmax(val, axis=-1)  # first max wins, matching `val > max`
    bx = jnp.take_along_axis(sum_x, best[:, None], axis=-1)[:, 0]
    by = jnp.take_along_axis(sum_y, best[:, None], axis=-1)[:, 0]
    angle = _atan2_cv(by, bx)
    # The reference keeps angle 0 when no window beats max=0.
    return jnp.where(jnp.max(val, axis=-1) > 0.0, angle, 0.0)


def _mldb_pack(ri, rx, ry, co, si, pattern_size):
    """Cell means -> rotated channels -> 486 comparisons -> packed words.

    ``ri``/``rx``/``ry``: (K, U) UNIQUE-position sampled Lt/Lx/Ly values
    (see :func:`mldb_unique_tables`).
    ``co``/``si``: (K, 1). Returns (K, 16) uint32.
    """
    _, _, member, cell_counts = mldb_unique_tables(pattern_size)
    _, _, comparisons = mldb_tables(pattern_size)
    onehot = jnp.asarray(member).astype(ri.dtype)  # (29, U)
    inv_counts = (1.0 / cell_counts.astype(np.float32))[None, :]
    di = (ri @ onehot.T) * inv_counts  # (K, 29)
    sx = (rx @ onehot.T) * inv_counts
    sy = (ry @ onehot.T) * inv_counts
    # Rotate the mean gradient (linear, so mean-then-rotate == rotate-then-
    # mean): dx stores -rx*si + ry*co, dy stores rx*co + ry*si
    # (descriptors.rs:160-166).
    dx = -sx * si + sy * co
    dy = sx * co + sy * si
    values = jnp.stack([di, dx, dy], axis=-1)  # (K, 29, 3)

    ci = jnp.asarray(comparisons[:, 0])
    cj = jnp.asarray(comparisons[:, 1])
    ch = jnp.asarray(comparisons[:, 2])
    bits = values[:, ci, ch] > values[:, cj, ch]  # (K, 486)

    n_bits = bits.shape[-1]
    pad = (-n_bits) % 32
    bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(bits.shape[0], -1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def _mldb_sample_positions(xf, yf, scale, angle, pattern_size):
    """Rotated grid sample coords for the UNIQUE offsets: (x1, y1) int32
    (K, U)."""
    uk, ul, _, _ = mldb_unique_tables(pattern_size)
    ks = jnp.asarray(uk.astype(np.float32))
    ls = jnp.asarray(ul.astype(np.float32))
    co = jnp.cos(angle)[:, None]
    si = jnp.sin(angle)[:, None]
    sc = scale[:, None]
    sample_y = yf[:, None] + (ls[None, :] * co + ks[None, :] * si) * sc
    sample_x = xf[:, None] + (-ls[None, :] * si + ks[None, :] * co) * sc
    return (
        round_half_away(sample_x).astype(jnp.int32),
        round_half_away(sample_y).astype(jnp.int32),
        co,
        si,
    )


# ---------------------------------------------------------------------------
# Flat-addressed kernels (one 1-D buffer for ALL evolutions)
#
# The throughput path concatenates every evolution's plane into one flat
# buffer; a keypoint of evolution e addresses pixel (x, y) at
# ``base[e] + y * width[e] + x``.  This turns the per-octave-group gathers
# into ONE 1-D gather per plane — the fastest gather form on TPU.
# ---------------------------------------------------------------------------


def orientation_flat(
    flat_pack: jnp.ndarray,  # (P, 3) packed (Lt, Lx, Ly)
    base: jnp.ndarray,  # (K,) i32 plane base offset of each keypoint
    width: jnp.ndarray,  # (K,) i32 plane width
    height: jnp.ndarray,  # (K,) i32 plane height
    xf: jnp.ndarray,  # (K,) octave coords
    yf: jnp.ndarray,
    s: jnp.ndarray,  # (K,) rounded sampling scale
) -> jnp.ndarray:
    di, dj, wt = (jnp.asarray(a) for a in orientation_table())
    ix = round_half_away(xf[:, None] + di[None, :] * s[:, None]).astype(jnp.int32)
    iy = round_half_away(yf[:, None] + dj[None, :] * s[:, None]).astype(jnp.int32)
    ix = jnp.clip(ix, 0, width[:, None] - 1)
    iy = jnp.clip(iy, 0, height[:, None] - 1)
    idx = base[:, None] + iy * width[:, None] + ix
    # One packed gather fetches (Lt, Lx, Ly); the gather cost is index-bound,
    # so the 3-wide trailing slice is nearly free (measured ~3x over
    # separate gathers).
    vals = flat_pack[idx.reshape(-1), 1:]
    vals = vals.reshape(idx.shape + (2,))
    res_x = wt[None, :] * vals[..., 0]
    res_y = wt[None, :] * vals[..., 1]
    return _orientation_from_samples(res_x, res_y)


def orientation_padded(
    planes: jnp.ndarray,  # (L, 3, Hmax, Wmax) channel-major padded stack
    lvl: jnp.ndarray,  # (K,) i32 plane index per keypoint
    width: jnp.ndarray,  # (K,) true plane width
    height: jnp.ndarray,  # (K,)
    xf: jnp.ndarray,  # (K,) octave coords
    yf: jnp.ndarray,
    s: jnp.ndarray,  # (K,) rounded sampling scale
) -> jnp.ndarray:
    """Dominant orientation sampled from the shared padded plane stack
    (same semantics as :func:`orientation_flat`; lets the throughput path
    drop the flat_pack buffer entirely)."""
    di, dj, wt = (jnp.asarray(a) for a in orientation_table())
    ix = round_half_away(xf[:, None] + di[None, :] * s[:, None]).astype(jnp.int32)
    iy = round_half_away(yf[:, None] + dj[None, :] * s[:, None]).astype(jnp.int32)
    ix = jnp.clip(ix, 0, width[:, None] - 1)
    iy = jnp.clip(iy, 0, height[:, None] - 1)
    res_x = wt[None, :] * planes[lvl[:, None], 1, iy, ix]
    res_y = wt[None, :] * planes[lvl[:, None], 2, iy, ix]
    return _orientation_from_samples(res_x, res_y)


def mldb_flat_onehot(
    planes: jnp.ndarray,  # (L, 3, Hmax, Wmax) channel-major padded stack
    lvl: jnp.ndarray,  # (K,) i32 plane index per keypoint
    width: jnp.ndarray,  # (K,) true plane width (for the OOB mask)
    height: jnp.ndarray,  # (K,)
    xf: jnp.ndarray,
    yf: jnp.ndarray,
    scale: jnp.ndarray,
    angle: jnp.ndarray,
    pattern_size: int = 10,
    chunk: int = 128,
):
    """Gather-free M-LDB sampling: per-keypoint patch extraction +
    factorized one-hot selection on the MXU.

    XLA's gather costs ~18 ns/index; the 1241-sample rotated grids make it
    the extractor's dominant stage.  This formulation dynamic-slices a
    128x128x3 patch per keypoint (bandwidth-bound) and resolves the samples
    as ``value[s] = onehot_row[s] @ patch @ onehot_col[s]`` — two dense
    contractions.  ``Precision.HIGHEST`` keeps the selection bit-exact.
    The stack is channel-major so the tiled (lane) dims are the image plane,
    not a 3-wide channel axis (which would tile-pad 3 -> 128).
    Returns ``(words (K, 16) uint32, ok (K,))``, identical to
    :func:`mldb_flat`.
    """
    k_total = xf.shape[0]
    if k_total % chunk:
        pad = chunk - k_total % chunk
        lvl = jnp.pad(lvl, (0, pad))
        width = jnp.pad(width, (0, pad), constant_values=128)
        height = jnp.pad(height, (0, pad), constant_values=128)
        xf = jnp.pad(xf, (0, pad), constant_values=64.0)
        yf = jnp.pad(yf, (0, pad), constant_values=64.0)
        scale = jnp.pad(scale, (0, pad), constant_values=1.0)
        angle = jnp.pad(angle, (0, pad))
        words, ok = mldb_flat_onehot(
            planes, lvl, width, height, xf, yf, scale, angle, pattern_size, chunk
        )
        return words[:k_total], ok[:k_total]
    x1, y1, co, si = _mldb_sample_positions(xf, yf, scale, angle, pattern_size)
    oob = (
        (x1 < 0) | (x1 >= width[:, None]) | (y1 < 0) | (y1 >= height[:, None])
    )
    ok = ~jnp.any(oob, axis=-1)
    x1 = jnp.clip(x1, 0, width[:, None] - 1)
    y1 = jnp.clip(y1, 0, height[:, None] - 1)

    p = 128
    hmax, wmax = planes.shape[2], planes.shape[3]
    y0 = jnp.clip(yf.astype(jnp.int32) - p // 2, 0, hmax - p)
    x0 = jnp.clip(xf.astype(jnp.int32) - p // 2, 0, wmax - p)
    # Clamped samples of valid keypoints always land inside the patch
    # (pattern_size * sqrt(2) * scale <= 58 < 64); invalid keypoints only
    # need in-bounds indices.
    rel_y = jnp.clip(y1 - y0[:, None], 0, p - 1)
    rel_x = jnp.clip(x1 - x0[:, None], 0, p - 1)

    assert k_total % chunk == 0, (k_total, chunk)
    ns = x1.shape[1]

    def do_chunk(args):
        lvl_c, y0_c, x0_c, rel_y_c, rel_x_c = args

        def slice_one(l, y, x):
            zero = jnp.zeros((), l.dtype)  # keep index dtypes uniform under x64
            return jax.lax.dynamic_slice(planes, (l, zero, y, x), (1, 3, p, p))[0]

        patch = jax.vmap(slice_one)(lvl_c, y0_c, x0_c)  # (chunk, 3, p, p)
        iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, ns, p), 2)
        oh_row = (iota == rel_y_c[:, :, None]).astype(jnp.float32)
        oh_col = (iota == rel_x_c[:, :, None]).astype(jnp.float32)
        # Column-select then row-select; both exact under HIGHEST.
        t = jnp.einsum(
            "knw,kchw->knch", oh_col, patch,
            precision=jax.lax.Precision.HIGHEST,
        )  # (chunk, ns, 3, p)
        vals = jnp.einsum(
            "knh,knch->kcn", oh_row, t, precision=jax.lax.Precision.HIGHEST
        )  # (chunk, 3, ns) — channel-major so no 3-wide lane axis
        return vals

    n_chunks = k_total // chunk
    vals = jax.lax.map(
        do_chunk,
        (
            lvl.reshape(n_chunks, chunk),
            y0.reshape(n_chunks, chunk),
            x0.reshape(n_chunks, chunk),
            rel_y.reshape(n_chunks, chunk, ns),
            rel_x.reshape(n_chunks, chunk, ns),
        ),
    ).reshape(k_total, 3, ns)
    ri, rx, ry = vals[:, 0], vals[:, 1], vals[:, 2]
    return _mldb_pack(ri, rx, ry, co, si, pattern_size), ok


def _split_bf16x3(x):
    """Exact 3-term bf16 split of f32: x == x1 + x2 + x3 bitwise (24-bit
    mantissa covered by 3 x 8-bit bf16 mantissas; image-derived magnitudes
    stay far from bf16 overflow/subnormal edges)."""
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    r2 = r1 - x2.astype(jnp.float32)
    x3 = r2.astype(jnp.bfloat16)
    return x1, x2, x3


def _row_reduce(oh_row, t, fused):
    """vals[k, c, n] = sum_h oh_row[k, n, h] * t[k, n, c, h].

    ``fused=False``: dot_general (einsum) — XLA materializes ``t`` in HBM
    between the two dots.  ``fused=True``: broadcast-multiply + reduce,
    which XLA can fuse into the producer dot's output so the (chunk, ns, 3,
    p) intermediate never round-trips HBM.  One-hot row selection is exact
    under either form (single nonzero term per sum).
    """
    if not fused:
        return jnp.einsum(
            "knh,knch->kcn", oh_row, t, precision=jax.lax.Precision.HIGHEST
        )
    return jnp.sum(oh_row[:, :, None, :] * t, axis=-1).transpose(0, 2, 1)


def _select_bf16x3k(rel_x, rel_y, patch):
    """One-GEMM exact selection: vals[k, c, n] = patch[k, c, rel_y, rel_x].

    The three exact bf16 split terms of the patch are stacked along the
    CONTRACTION dim (K = 3x128) and the channel axis along N (N = 3x128),
    so the whole row-selection is a single bf16 batched GEMM with f32 MXU
    accumulation: the three split products hit the same accumulator and
    their f32 sum reconstructs the f32 sample exactly in any order (every
    partial sum needs <= 24 mantissa bits).  Halves the MXU passes of the
    f32 Precision.HIGHEST einsum (6 -> 3) at identical bit-exact output.

    ``patch``: (chunk, C, P, P) f32; ``rel_x``/``rel_y``: (chunk, ns) i32.
    Returns (chunk, C, ns) f32.
    """
    k, c, p, _ = patch.shape
    ns = rel_x.shape[1]
    # (h, c*w) layout so channels ride the GEMM's N dim.
    patch_t = patch.transpose(0, 2, 1, 3).reshape(k, p, c * p)
    p1, p2, p3 = _split_bf16x3(patch_t)
    p_k = jnp.concatenate([p1, p2, p3], axis=1)  # (k, 3P, c*P) bf16
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, ns, 3 * p), 2)
    ohr = (iota % p == rel_y[:, :, None]).astype(jnp.bfloat16)
    t = jax.lax.dot_general(
        ohr,
        p_k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (k, ns, c*P): row h = rel_y selected, exact
    t = t.reshape(k, ns, c, p)
    colmask = jax.lax.broadcasted_iota(jnp.int32, (k, ns, p), 2) == rel_x[:, :, None]
    return jnp.sum(jnp.where(colmask[:, :, None, :], t, 0.0), axis=-1).transpose(
        0, 2, 1
    )  # (k, c, ns)


def _onehot_select_rows(oh_col, patch, mode):
    """t[n, c, h] = sum_w oh_col[n, w] * patch[c, h, w] for a keypoint chunk.

    ``mode``: 'highest' = f32 einsum at Precision.HIGHEST;
    'bf16x3' = exact 3-pass bf16 decomposition of the patch against a bf16
    one-hot (bit-identical: each pass selects one bf16 split term exactly,
    and the f32 sum of the three split terms reconstructs the f32 value).
    """
    if mode == "highest":
        return jnp.einsum(
            "knw,kchw->knch", oh_col, patch, precision=jax.lax.Precision.HIGHEST
        )
    oh = oh_col.astype(jnp.bfloat16)
    p1, p2, p3 = _split_bf16x3(patch)
    acc = None
    for p_i in (p1, p2, p3):
        t_i = jnp.einsum(
            "knw,kchw->knch",
            oh,
            p_i,
            preferred_element_type=jnp.float32,
        )
        acc = t_i if acc is None else acc + t_i
    return acc


def window_catalog_size(specs, b: int, hp: int, wp: int) -> int:
    """Static count of distinct 256x256 tile-aligned sampling windows the
    extract can ever occupy — the bound that makes the 'pgroups' padded
    group tables static.  Per level: ty = clip(clip(yf - 64, 0, hp-128)
    // 128, 0, ht-2) with yf < real height, so ty spans
    min((h-65)//128, ht-2) + 1 values (same for tx)."""
    ht, wt = hp // 128, wp // 128
    total = 0
    for s in specs:
        nty = min(max(s.height - 65, 0) // 128, max(ht - 2, 0)) + 1
        ntx = min(max(s.width - 65, 0) // 128, max(wt - 2, 0)) + 1
        total += nty * ntx
    return b * total


def _group_tables(lvl, ty, tx, valid, ht, wt, g, ng_cap, w=1):
    """Window-sorted padded group tables for ``select_samples_groups``.

    Sorts slots by window key (invalid slots to a sentinel segment), then
    starts a new group at every segment boundary OR every g-th slot within a
    segment — so every group is single-window and
    NG_actual <= ceil(K/g) + n_segments <= ng_cap (static, from
    :func:`window_catalog_size`).  No scatters: per-group tables come from
    masked reduces over a (NG, K) one-hot, and the padded slot layout is
    expressed as gathers (src_of) plus the inverse map (p_of).

    Tables come back in the kernel's COLUMN-major strided layout for ``w``
    window-groups per grid step: canonical sorted group t sits at table
    position (t % ngw)*w + t//ngw (ngw = NG//w), so each of the step's w
    quadrant-ref columns walks CONSECUTIVE sorted groups across steps and
    same-window runs keep their DMA-skip property.

    Returns (perm, win_lvl, win_ty, win_tx, n_active, src_of, p_of):
      perm: (K,) sort order; all other per-slot arrays must be indexed by it.
      src_of: (NG*g,) sorted-slot index feeding each padded slot.
      p_of: (K,) padded slot index of each sorted slot.
    """
    k = lvl.shape[0]
    i32 = jnp.int32
    sentinel = i32(1) << i32(24)
    key = jnp.where(valid, (lvl * ht + ty) * wt + tx, sentinel).astype(i32)
    lvl0 = jnp.where(valid, lvl, 0).astype(i32)
    ty0 = jnp.where(valid, ty, 0).astype(i32)
    tx0 = jnp.where(valid, tx, 0).astype(i32)
    perm = jnp.argsort(key, stable=True)
    ks = key[perm]
    iota = jnp.arange(k, dtype=i32)
    newseg = jnp.concatenate(
        [jnp.ones((1,), bool), ks[1:] != ks[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(newseg, iota, 0))
    rank = iota - seg_start
    new_group = newseg | (rank % g == 0)
    group_id = jnp.cumsum(new_group.astype(i32)) - 1  # < ng_cap by bound
    slot_in = rank % g

    ngw = -(-ng_cap // w)
    ng = ngw * w
    valid_s = valid[perm]
    # Per-group tables by SCATTER at the group-boundary slots (each group
    # has exactly one boundary; non-boundary slots write a dummy tail slot).
    # Scatter of K elements costs ~us; the previous (NG, K) one-hot masked
    # reduces measured 5.8 ms standalone at the bench shape.
    dump = jnp.where(new_group, group_id, ng)

    def tbl(v):
        buf = jnp.zeros((ng + 1,), i32)
        return buf.at[dump].set(jnp.where(new_group, v, 0))[:ng]

    win_lvl_c = tbl(lvl0[perm])
    win_ty_c = tbl(ty0[perm])
    win_tx_c = tbl(tx0[perm])
    j0_c = (
        jnp.full((ng + 1,), k, i32)
        .at[dump]
        .set(jnp.where(new_group, iota, k))
    )
    # Groups tile the sorted axis in order, so each group's size is the gap
    # to the next group's first slot (empty tail groups: k - k = 0).
    size_c = jnp.clip(j0_c[1:] - j0_c[:ng], 0, g)
    bvalid = valid_s[jnp.clip(j0_c[:ng], 0, k - 1)] & (j0_c[:ng] < k)
    n_active_c = jnp.where(bvalid, size_c, 0)
    j0_c = j0_c[:ng]

    # Strided (column-major) re-index: position q holds canonical group
    # (q % w)*ngw + q//w.
    q = jnp.arange(ng, dtype=i32)
    stride_idx = (q % w) * ngw + q // w
    win_lvl = win_lvl_c[stride_idx]
    win_ty = win_ty_c[stride_idx]
    win_tx = win_tx_c[stride_idx]
    n_active = n_active_c[stride_idx]
    j0 = j0_c[stride_idx]
    src_of = jnp.clip(
        j0[:, None] + jnp.arange(g, dtype=i32)[None, :], 0, k - 1
    ).reshape(-1)
    p_of = ((group_id % ngw) * w + group_id // ngw) * g + slot_in
    return perm, win_lvl, win_ty, win_tx, n_active, src_of, p_of


def orient_mldb_groups(
    planes, lvl, width, height, xf, yf, scale, valid, pattern_size, ng_cap,
    w=1,
):
    """Fully-fused describe over the tile-coherent group kernel
    (``pallas_mldb.select_samples_groups``): no per-keypoint patch buffer
    and no XLA patch cut (the 18.6 ms row-gather wall at the bench shape).
    Keypoints sharing a 256x256 tile-aligned window ride one grid step's
    four shared quadrant DMAs; window-sorted groups make consecutive steps'
    DMAs repeat (skipped).  Bit-identical to the 'pgather'/'highest' paths
    (pure f32 gathers; tests gate it).

    Reference hot loops being replaced:
    ``/root/reference/akaze/src/descriptors.rs:102-177`` and
    ``scale_space_extrema.rs:229-288``."""
    from . import pallas_mldb

    g = pallas_mldb.G
    k_in = xf.shape[0]
    pad_k = (-k_in) % g
    if pad_k:
        lvl = jnp.pad(lvl, (0, pad_k))
        width = jnp.pad(width, (0, pad_k), constant_values=128)
        height = jnp.pad(height, (0, pad_k), constant_values=128)
        xf = jnp.pad(xf, (0, pad_k), constant_values=64.0)
        yf = jnp.pad(yf, (0, pad_k), constant_values=64.0)
        scale = jnp.pad(scale, (0, pad_k), constant_values=1.0)
        valid = jnp.pad(valid, (0, pad_k))
        words, ok, angle = orient_mldb_groups(
            planes, lvl, width, height, xf, yf, scale, valid, pattern_size,
            ng_cap, w,
        )
        return words[:k_in], ok[:k_in], angle[:k_in]

    hmax, wmax = planes.shape[2], planes.shape[3]
    ht, wt = hmax // 128, wmax // 128
    assert ht >= 2 and wt >= 2, (ht, wt)  # stage_describe guards this
    p = 128
    # Patch anchor exactly as the chunked paths compute it, then the
    # enclosing 256-window tile (clamped so ty+1/tx+1 stay in range).
    y0 = jnp.clip(yf.astype(jnp.int32) - p // 2, 0, hmax - p)
    x0 = jnp.clip(xf.astype(jnp.int32) - p // 2, 0, wmax - p)
    ty = jnp.clip(y0 // p, 0, ht - 2)
    tx = jnp.clip(x0 // p, 0, wt - 2)

    perm, win_lvl, win_ty, win_tx, n_active, src_of, p_of = _group_tables(
        lvl.astype(jnp.int32), ty, tx, valid, ht, wt, g, ng_cap, w
    )
    inv = jnp.argsort(perm)
    ngw = -(-ng_cap // w)
    npad = ngw * w * g

    # Per-PADDED-slot scalar params (cheap scalar gathers); the rel tables
    # are then computed DIRECTLY in the kernel's padded layout — gathering
    # precomputed (K, NS) rel rows into it measured 5 ms per table
    # standalone (element-granular lowering, exp_r5_groups_micro).
    osrc = perm[src_of]  # (NPAD,) ORIGINAL slot feeding each padded slot

    def ps(a):
        return a[osrc]

    xf_p, yf_p, sc_p = ps(xf), ps(yf), ps(scale)
    w_p, h_p = ps(width), ps(height)
    # The slot's GROUP window origin (must match its quadrant blocks).
    txp = jnp.repeat(win_tx, g) * p
    typ = jnp.repeat(win_ty, g) * p

    # Orientation samples (window-relative), built padded.
    di, dj, wt_g = (jnp.asarray(a) for a in orientation_table())
    ox = round_half_away(xf_p[:, None] + di[None, :] * sc_p[:, None]).astype(jnp.int32)
    oy = round_half_away(yf_p[:, None] + dj[None, :] * sc_p[:, None]).astype(jnp.int32)
    ox = jnp.clip(ox, 0, w_p[:, None] - 1)
    oy = jnp.clip(oy, 0, h_p[:, None] - 1)
    orel_x = jnp.clip(ox - txp[:, None], 0, 2 * p - 1)
    orel_y = jnp.clip(oy - typ[:, None], 0, 2 * p - 1)
    n_or = int(di.shape[0])
    pad_or = (-n_or) % p
    if pad_or:
        orel_x = jnp.pad(orel_x, ((0, 0), (0, pad_or)))
        orel_y = jnp.pad(orel_y, ((0, 0), (0, pad_or)))
    vo = pallas_mldb.select_samples_groups(
        planes, win_lvl, win_ty, win_tx, n_active,
        orel_x.reshape(ngw, w * g, -1), orel_y.reshape(ngw, w * g, -1),
        c0=1, w=w,
    )[..., :n_or]  # (NPAD, 2, n_or), padded layout
    res_x = wt_g[None, :] * vo[:, 0]
    res_y = wt_g[None, :] * vo[:, 1]
    angle_p = _orientation_from_samples(res_x, res_y)

    # M-LDB samples (need the angle), still padded.
    uk, ul, _, _ = mldb_unique_tables(pattern_size)
    ks_t = jnp.asarray(uk.astype(np.float32))
    ls_t = jnp.asarray(ul.astype(np.float32))
    co = jnp.cos(angle_p)[:, None]
    si = jnp.sin(angle_p)[:, None]
    sc = sc_p[:, None]
    sy = yf_p[:, None] + (ls_t[None, :] * co + ks_t[None, :] * si) * sc
    sx = xf_p[:, None] + (-ls_t[None, :] * si + ks_t[None, :] * co) * sc
    x1 = round_half_away(sx).astype(jnp.int32)
    y1 = round_half_away(sy).astype(jnp.int32)
    oob = (x1 < 0) | (x1 >= w_p[:, None]) | (y1 < 0) | (y1 >= h_p[:, None])
    ok_p = ~jnp.any(oob, axis=-1)
    x1 = jnp.clip(x1, 0, w_p[:, None] - 1)
    y1 = jnp.clip(y1, 0, h_p[:, None] - 1)
    rel_x = jnp.clip(x1 - txp[:, None], 0, 2 * p - 1)
    rel_y = jnp.clip(y1 - typ[:, None], 0, 2 * p - 1)
    ns = int(uk.shape[0])
    pad_ns = (-ns) % p
    if pad_ns:
        rel_x = jnp.pad(rel_x, ((0, 0), (0, pad_ns)))
        rel_y = jnp.pad(rel_y, ((0, 0), (0, pad_ns)))
    vals = pallas_mldb.select_samples_groups(
        planes, win_lvl, win_ty, win_tx, n_active,
        rel_x.reshape(ngw, w * g, -1), rel_y.reshape(ngw, w * g, -1), w=w,
    )[..., :ns]  # (NPAD, 3, ns)
    # Pack on the padded layout (row-wise, so per-slot bits are identical),
    # then un-permute only the 16-word rows + scalars — the (K,) gather of
    # (3, 1408) sample blocks measured 19 ms standalone.
    words_p = _mldb_pack(
        vals[:, 0], vals[:, 1], vals[:, 2], co, si, pattern_size
    )
    back = p_of[inv]  # padded slot of each ORIGINAL slot
    return words_p[back], ok_p[back], angle_p[back]


def orient_mldb_onehot(
    planes: jnp.ndarray,  # (L, 3, Hmax, Wmax) channel-major padded stack,
    #                       or (L, Hmax, 3*Wmax) pixel-interleaved when
    #                       ``interleaved`` (lane = 3*x + ch)
    lvl: jnp.ndarray,  # (K,) i32 plane index per keypoint
    width: jnp.ndarray,  # (K,) true plane width (for the OOB mask)
    height: jnp.ndarray,  # (K,)
    xf: jnp.ndarray,
    yf: jnp.ndarray,
    scale: jnp.ndarray,
    pattern_size: int = 10,
    chunk: int = 128,
    mode: str = "highest",
    interleaved: bool = False,
):
    """Fused orientation + M-LDB via ONE patch extraction per keypoint.

    Extracts each keypoint's 128x128x3 patch once, resolves the 109
    orientation samples AND (after computing the angle in-chunk) the 1241
    descriptor samples with factorized one-hot MXU contractions.  Replaces
    the gather-based orientation (109 samples x 2 planes x 18ns/index) and
    halves the patch traffic versus running the two kernels separately.
    Returns ``(words (K, 16) uint32, ok (K,), angle (K,))``.

    ``interleaved`` cuts each patch as ONE (128, 384) row-contiguous slice
    from the pixel-interleaved stack and de-interleaves in-registers: the
    cut is gather-row-latency bound, so 128 rows instead of 384 per
    keypoint (bit-exact; the de-interleave is a pure relayout).
    """
    if mode == "ptiles":
        # Retired measured-loser path; available only when
        # experiments/pallas_mldb_losers.py has been imported.
        assert not interleaved, "'ptiles' reads the channel-major stack"
        if mode not in EXTERNAL_MODES:
            raise KeyError(
                "'ptiles' was retired to experiments/pallas_mldb_losers.py; "
                "import that module first"
            )
        return EXTERNAL_MODES[mode](
            planes, lvl, width, height, xf, yf, scale, pattern_size
        )
    k_total = xf.shape[0]
    if k_total % chunk:
        pad = chunk - k_total % chunk
        lvl = jnp.pad(lvl, (0, pad))
        width = jnp.pad(width, (0, pad), constant_values=128)
        height = jnp.pad(height, (0, pad), constant_values=128)
        xf = jnp.pad(xf, (0, pad), constant_values=64.0)
        yf = jnp.pad(yf, (0, pad), constant_values=64.0)
        scale = jnp.pad(scale, (0, pad), constant_values=1.0)
        words, ok, angle = orient_mldb_onehot(
            planes, lvl, width, height, xf, yf, scale, pattern_size, chunk,
            mode, interleaved,
        )
        return words[:k_total], ok[:k_total], angle[:k_total]

    mode, _, rows = mode.partition("+")
    fused_rows = rows == "fused"
    use_k = mode == "bf16x3k"
    use_epatch = mode == "pepatch"
    use_fused = mode == "pfused"
    use_pallas = mode in ("pallas", "pgather")
    if use_epatch:
        # Retired measured-loser path (the cut as per-keypoint ELEMENT-offset
        # block DMAs); available only when experiments/pallas_mldb_losers.py
        # has been imported.
        assert not interleaved, "'pepatch' reads the channel-major stack"
        if "pepatch" not in EXTERNAL_MODES:
            raise KeyError(
                "'pepatch' was retired to experiments/pallas_mldb_losers.py; "
                "import that module first"
            )
        _epatch_select = partial(EXTERNAL_MODES["pepatch"], planes)

    if use_pallas:
        from . import pallas_mldb

        use_gather = mode == "pgather"

        def _pallas_select(patch, rel_x, rel_y, c0=0):
            """(chunk, C, p, p) x (chunk, ns) -> (chunk, C - c0, ns) via the
            keypoint-batched Pallas kernel; pads ns to a lane multiple."""
            ns_in = rel_x.shape[1]
            ns_pad = (-ns_in) % 128
            if ns_pad:
                rel_x = jnp.pad(rel_x, ((0, 0), (0, ns_pad)))
                rel_y = jnp.pad(rel_y, ((0, 0), (0, ns_pad)))
            if use_gather:
                vals = pallas_mldb.select_samples_gather(
                    patch, rel_x, rel_y, c0=c0
                )
            else:
                vals = pallas_mldb.select_samples_batched(
                    patch[:, c0:] if c0 else patch, rel_x, rel_y
                )
            return vals[:, :, :ns_in]

    p = 128
    if interleaved:
        hmax, wmax = planes.shape[1], planes.shape[2] // 3
    else:
        hmax, wmax = planes.shape[2], planes.shape[3]
    y0 = jnp.clip(yf.astype(jnp.int32) - p // 2, 0, hmax - p)
    x0 = jnp.clip(xf.astype(jnp.int32) - p // 2, 0, wmax - p)

    # Orientation sample positions (109-disc), patch-relative.
    di, dj, wt = (jnp.asarray(a) for a in orientation_table())
    ox = round_half_away(xf[:, None] + di[None, :] * scale[:, None]).astype(jnp.int32)
    oy = round_half_away(yf[:, None] + dj[None, :] * scale[:, None]).astype(jnp.int32)
    ox = jnp.clip(ox, 0, width[:, None] - 1)
    oy = jnp.clip(oy, 0, height[:, None] - 1)
    orel_x = jnp.clip(ox - x0[:, None], 0, p - 1)
    orel_y = jnp.clip(oy - y0[:, None], 0, p - 1)

    uk, ul, _, _ = mldb_unique_tables(pattern_size)
    ks = jnp.asarray(uk.astype(np.float32))
    ls = jnp.asarray(ul.astype(np.float32))
    ns = int(uk.shape[0])
    n_or = int(di.shape[0])

    def do_chunk(args):
        lvl_c, y0_c, x0_c, orx, ory, xf_c, yf_c, sc_c, w_c, h_c = args

        if use_epatch:
            patch = None
        elif interleaved:

            def slice_one(l, y, x):
                return jax.lax.dynamic_slice(
                    planes, (l, y, 3 * x), (1, p, 3 * p)
                )[0]

            raw = jax.vmap(slice_one)(lvl_c, y0_c, x0_c)  # (chunk, p, 3p)
            # lane = 3*dx + ch -> (chunk, 3, p, p); bit-exact relayout.
            patch = jnp.swapaxes(raw.reshape(chunk, p, p, 3), 1, 3).swapaxes(
                2, 3
            )
        else:

            def slice_one(l, y, x):
                zero = jnp.zeros((), l.dtype)  # keep index dtypes uniform under x64
                return jax.lax.dynamic_slice(
                    planes, (l, zero, y, x), (1, 3, p, p)
                )[0]

            patch = jax.vmap(slice_one)(lvl_c, y0_c, x0_c)  # (chunk, 3, p, p)

        if use_fused:
            # Single-pass kernel: orientation select + in-kernel angle +
            # M-LDB positions + select — one patch read instead of two
            # (pallas_mldb.select_samples_fused).  Device-gated for trig
            # bit-equality before it can be a default.
            from . import pallas_mldb

            hmax_f = planes.shape[2]
            wmax_f = planes.shape[3]
            pad_or_f = p - n_or
            orx_f = jnp.pad(orx, ((0, 0), (0, pad_or_f)))
            ory_f = jnp.pad(ory, ((0, 0), (0, pad_or_f)))
            wt_row = jnp.zeros((8, p), jnp.float32).at[0, :n_or].set(wt)
            ang1s, ang2s = (jnp.asarray(a) for a in orientation_windows())
            a1_tbl = jnp.zeros((48, p), jnp.float32).at[: ang1s.shape[0]].set(
                jnp.broadcast_to(ang1s[:, None], (ang1s.shape[0], p))
            )
            a2_tbl = jnp.zeros((48, p), jnp.float32).at[: ang2s.shape[0]].set(
                jnp.broadcast_to(ang2s[:, None], (ang2s.shape[0], p))
            )
            nc_f = -(-ns // p)
            uk_tbl = jnp.zeros((8, p), jnp.float32).at[:nc_f].set(
                jnp.pad(ks, (0, nc_f * p - ns)).reshape(nc_f, p)
            )
            ul_tbl = jnp.zeros((8, p), jnp.float32).at[:nc_f].set(
                jnp.pad(ls, (0, nc_f * p - ns)).reshape(nc_f, p)
            )
            vals_f, meta = pallas_mldb.select_samples_fused(
                patch, orx_f, ory_f, xf_c, yf_c, sc_c,
                w_c.astype(jnp.int32), h_c.astype(jnp.int32),
                wt_row, a1_tbl, a2_tbl, uk_tbl, ul_tbl,
                ns_u=ns, hmax=hmax_f, wmax=wmax_f,
            )
            angle_c = meta[:, 0]
            co = meta[:, 1:2]
            si = meta[:, 2:3]
            ok_c = meta[:, 3] > 0.5
            vals = vals_f[:, :, :ns]
            words_c = _mldb_pack(
                vals[:, 0], vals[:, 1], vals[:, 2], co, si, pattern_size
            )
            return words_c, ok_c, angle_c

        # --- orientation from the same patch ---
        if use_epatch:
            vo = _epatch_select(lvl_c, y0_c, x0_c, orx, ory, c0=1)
        elif use_k:
            vo = _select_bf16x3k(orx, ory, patch[:, 1:])  # (chunk, 2, n_or)
        elif use_pallas:
            vo = _pallas_select(patch, orx, ory, c0=1)  # (chunk, 2, n_or)
        else:
            iota_o = jax.lax.broadcasted_iota(jnp.int32, (chunk, n_or, p), 2)
            ohc_o = (iota_o == orx[:, :, None]).astype(jnp.float32)
            ohr_o = (iota_o == ory[:, :, None]).astype(jnp.float32)
            t_o = _onehot_select_rows(ohc_o, patch[:, 1:], mode)  # (chunk, n_or, 2, p)
            vo = _row_reduce(ohr_o, t_o, fused_rows)  # (chunk, 2, n_or)
        res_x = wt[None, :] * vo[:, 0]
        res_y = wt[None, :] * vo[:, 1]
        angle_c = _orientation_from_samples(res_x, res_y)

        # --- M-LDB sample positions (need the angle) ---
        co = jnp.cos(angle_c)[:, None]
        si = jnp.sin(angle_c)[:, None]
        sc = sc_c[:, None]
        sy = yf_c[:, None] + (ls[None, :] * co + ks[None, :] * si) * sc
        sx = xf_c[:, None] + (-ls[None, :] * si + ks[None, :] * co) * sc
        x1 = round_half_away(sx).astype(jnp.int32)
        y1 = round_half_away(sy).astype(jnp.int32)
        oob = (x1 < 0) | (x1 >= w_c[:, None]) | (y1 < 0) | (y1 >= h_c[:, None])
        ok_c = ~jnp.any(oob, axis=-1)
        x1 = jnp.clip(x1, 0, w_c[:, None] - 1)
        y1 = jnp.clip(y1, 0, h_c[:, None] - 1)
        rel_x = jnp.clip(x1 - x0_c[:, None], 0, p - 1)
        rel_y = jnp.clip(y1 - y0_c[:, None], 0, p - 1)

        if use_epatch:
            vals = _epatch_select(lvl_c, y0_c, x0_c, rel_x, rel_y)
        elif use_k:
            vals = _select_bf16x3k(rel_x, rel_y, patch)  # (chunk, 3, ns)
        elif use_pallas:
            vals = _pallas_select(patch, rel_x, rel_y)  # (chunk, 3, ns)
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, ns, p), 2)
            oh_col = (iota == rel_x[:, :, None]).astype(jnp.float32)
            oh_row = (iota == rel_y[:, :, None]).astype(jnp.float32)
            t = _onehot_select_rows(oh_col, patch, mode)  # (chunk, ns, 3, p)
            vals = _row_reduce(oh_row, t, fused_rows)  # (chunk, 3, ns)
        words_c = _mldb_pack(
            vals[:, 0], vals[:, 1], vals[:, 2], co, si, pattern_size
        )
        return words_c, ok_c, angle_c

    n_chunks = k_total // chunk
    words, ok, angle = jax.lax.map(
        do_chunk,
        (
            lvl.reshape(n_chunks, chunk),
            y0.reshape(n_chunks, chunk),
            x0.reshape(n_chunks, chunk),
            orel_x.reshape(n_chunks, chunk, n_or),
            orel_y.reshape(n_chunks, chunk, n_or),
            xf.reshape(n_chunks, chunk),
            yf.reshape(n_chunks, chunk),
            scale.reshape(n_chunks, chunk),
            width.reshape(n_chunks, chunk),
            height.reshape(n_chunks, chunk),
        ),
    )
    return (
        words.reshape(k_total, -1),
        ok.reshape(k_total),
        angle.reshape(k_total),
    )


def mldb_flat(
    flat_pack: jnp.ndarray,  # (P, 3) packed (Lt, Lx, Ly)
    base: jnp.ndarray,  # (K,)
    width: jnp.ndarray,
    height: jnp.ndarray,
    xf: jnp.ndarray,
    yf: jnp.ndarray,
    scale: jnp.ndarray,
    angle: jnp.ndarray,
    pattern_size: int = 10,
):
    x1, y1, co, si = _mldb_sample_positions(xf, yf, scale, angle, pattern_size)
    oob = (
        (x1 < 0)
        | (x1 >= width[:, None])
        | (y1 < 0)
        | (y1 >= height[:, None])
    )
    ok = ~jnp.any(oob, axis=-1)
    x1 = jnp.clip(x1, 0, width[:, None] - 1)
    y1 = jnp.clip(y1, 0, height[:, None] - 1)
    idx = base[:, None] + y1 * width[:, None] + x1
    vals = flat_pack[idx.reshape(-1), :].reshape(idx.shape + (3,))
    ri, rx, ry = vals[..., 0], vals[..., 1], vals[..., 2]
    return _mldb_pack(ri, rx, ry, co, si, pattern_size), ok


# ---------------------------------------------------------------------------
# Batched device kernels (per octave group: planes (S, H, W))
# ---------------------------------------------------------------------------


def compute_orientations(
    lx: jnp.ndarray,
    ly: jnp.ndarray,
    sub: jnp.ndarray,  # (K,) sublevel index into the stacked planes
    xf: jnp.ndarray,  # (K,) keypoint x in this octave's coords
    yf: jnp.ndarray,  # (K,)
    s: jnp.ndarray,  # (K,) sampling scale (f32, already rounded)
) -> jnp.ndarray:
    """Dominant orientation per keypoint (scale_space_extrema.rs:229-288)."""
    h, w = lx.shape[-2], lx.shape[-1]
    di, dj, wt = (jnp.asarray(a) for a in orientation_table())
    ix = round_half_away(xf[:, None] + di[None, :] * s[:, None]).astype(jnp.int32)
    iy = round_half_away(yf[:, None] + dj[None, :] * s[:, None]).astype(jnp.int32)
    # Rust `as usize` saturates negatives to zero; clamp top as well (the
    # reference would panic there, and the border guard prevents it).
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    sub_b = sub[:, None]
    res_x = wt[None, :] * lx[sub_b, iy, ix]
    res_y = wt[None, :] * ly[sub_b, iy, ix]
    return _orientation_from_samples(res_x, res_y)


def compute_mldb_descriptors(
    lt: jnp.ndarray,
    lx: jnp.ndarray,
    ly: jnp.ndarray,
    sub: jnp.ndarray,  # (K,)
    xf: jnp.ndarray,  # (K,) octave coords
    yf: jnp.ndarray,
    scale: jnp.ndarray,  # (K,) f32 rounded sampling scale
    angle: jnp.ndarray,  # (K,)
    pattern_size: int = 10,
):
    """486-bit M-LDB descriptors, bit-packed to (K, 16) uint32
    (descriptors.rs:55-202). Returns ``(words, ok)``; ``ok`` is False when
    any sample falls out of bounds (the reference drops such keypoints,
    descriptors.rs:131-140)."""
    h, w = lt.shape[-2], lt.shape[-1]
    x1, y1, co, si = _mldb_sample_positions(xf, yf, scale, angle, pattern_size)
    oob = (x1 < 0) | (x1 >= w) | (y1 < 0) | (y1 >= h)
    ok = ~jnp.any(oob, axis=-1)
    x1 = jnp.clip(x1, 0, w - 1)
    y1 = jnp.clip(y1, 0, h - 1)

    sub_b = sub[:, None]
    ri = lt[sub_b, y1, x1]  # (K, n_samples)
    rx = lx[sub_b, y1, x1]
    ry = ly[sub_b, y1, x1]
    return _mldb_pack(ri, rx, ry, co, si, pattern_size), ok
