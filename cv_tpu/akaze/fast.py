"""Fully-device batched AKAZE extraction (the throughput path).

The exact path (:mod:`cv_tpu.akaze.extract`) reproduces the reference's
order-dependent keypoint dedup on the host for golden parity.  This module
keeps the *entire* pipeline on device with static shapes so a batch of frames
compiles to one XLA program: candidates are selected with per-evolution
``top_k`` over masked response planes, the sequential dedup is replaced by a
batched cross-scale non-maximum suppression with the reference's radii and
response/order tie-breaking (scale_space_extrema.rs:75-140 semantics,
evaluated all-pairs instead of sequentially), and refinement/orientation/
descriptors run vmapped over frames.

Output is a fixed-budget :class:`FeatureSet` with validity masks — the
TPU-native stand-in for the reference's ``Vec<KeyPoint>``.

The pipeline is decomposed into stage functions (``stage_*``) so the
criterion-analog harness (``bench.py --stages``) can time each stage as its
own XLA program; ``DeviceExtractor.extract`` composes them under one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass
from . import descriptors as desc
from . import extrema
from .config import Akaze
from .scale_space import build_scale_space


@pytree_dataclass
class FeatureSet:
    """Batched keypoints + descriptors with a validity mask.

    All arrays have leading shape ``(B, M)`` (frames x feature budget).
    """

    point: jnp.ndarray  # (B, M, 2) f32, octave-0 pixel coords
    response: jnp.ndarray  # (B, M) f32
    size: jnp.ndarray  # (B, M) f32
    angle: jnp.ndarray  # (B, M) f32
    octave: jnp.ndarray  # (B, M) i32
    class_id: jnp.ndarray  # (B, M) i32
    words: jnp.ndarray  # (B, M, 16) uint32 packed M-LDB bits
    valid: jnp.ndarray  # (B, M) bool

    @property
    def count(self):
        return jnp.sum(self.valid, axis=-1)


# ---------------------------------------------------------------------------
# Stage 1: per-evolution top-K candidate selection
# ---------------------------------------------------------------------------


def stage_candidates(cfg, specs, planes, k, topk_method: str = "compact"):
    """Masked per-evolution top-K extrema candidates, pixel-order sorted.

    ``topk_method`` selects how the per-evolution budget is filled:

    * ``"compact"`` — exact pixel-order compaction (no sort at all; see
      :func:`_compact_candidates`).  Keeps the FIRST K candidates in pixel
      order on budget overflow — the reference iterates candidates in pixel
      order with no budget, so this is the faithful policy, and identical
      to top_k whenever a plane holds <= K candidates (typical count ~123
      vs K=256).
    * ``"block"`` — exact strongest-K: top_k over 2x2 block maxima (a
      strict 3x3 local max excludes 8-neighbors, so each 2x2 block holds at
      most one candidate; 4x smaller top_k input), then pixel-order sort.
    * ``"approx"`` — ``jax.lax.approx_max_k`` (TPU PartialReduce, recall
      0.99); can drop a candidate when two land in one shard (measured:
      one of 123 on the KITTI goldens), kept for experiments.
    * ``"raw"`` — exact strongest-K one-stage ``jax.lax.top_k``.
    """
    b = planes[0].ldet.shape[0]

    # Group consecutive evolutions that share a plane shape (one octave):
    # masks, block-reduce and top_k run once per GROUP over stacked
    # (B*S, H, W) planes instead of once per evolution.
    groups = []
    for i, p in enumerate(planes):
        shape = p.ldet.shape[-2:]
        if groups and groups[-1][0] == shape:
            groups[-1][1].append(i)
        else:
            groups.append([shape, [i]])

    def border_ok_1d(n, s):
        """Reference border predicate along one axis, f32-exact
        (scale_space_extrema.rs:96-104): round half-away-from-zero."""
        v = np.arange(n, dtype=np.float32)

        def rnd(x):
            return np.sign(x) * np.floor(np.abs(x) + np.float32(0.5))

        lo = rnd(v - np.float32(s)) - np.float32(1.0) >= 0.0
        hi = rnd(v + np.float32(s)) + np.float32(1.0) < np.float32(n)
        return lo & hi

    resp_list = [None] * len(planes)
    idx_list = [None] * len(planes)
    for (h_g, w_g), idxs_g in groups:
        stacked = jnp.stack([planes[i].ldet for i in idxs_g], axis=1)
        s_count = len(idxs_g)
        mask = extrema.candidate_mask(stacked, cfg.detector_threshold)
        # Border rejection folded into the mask: the reference rejects
        # border keypoints BEFORE they enter the dedup cache
        # (scale_space_extrema.rs:96-117), so they can neither survive nor
        # suppress others — pre-masking is exact, and keeps the pixel-order
        # candidate budget from filling with doomed border candidates.
        border = np.empty((s_count, h_g, w_g), bool)
        for j, i in enumerate(idxs_g):
            s = planes[i].spec
            smax_ss = float(extrema.SMAX) * float(
                np.round(
                    np.float32(np.float32(s.esigma) * cfg.derivative_factor)
                    / np.float32(2.0**s.octave)
                )
            )
            border[j] = (
                border_ok_1d(h_g, smax_ss)[:, None]
                & border_ok_1d(w_g, smax_ss)[None, :]
            )
        mask &= jnp.asarray(border)[None]
        masked = jnp.where(mask, stacked, -jnp.inf)
        flat = masked.reshape((b * s_count,) + masked.shape[-2:])
        if topk_method == "compact":
            resp_g, idx_g = _compact_candidates(flat.reshape(b * s_count, -1), k)
        elif topk_method == "approx":
            resp_g, idx_g = jax.lax.approx_max_k(
                flat.reshape(b * s_count, -1), k, recall_target=0.99
            )
        elif topk_method == "block":
            resp_g, idx_g = _block_top_k(flat, k)
        else:
            resp_g, idx_g = jax.lax.top_k(flat.reshape(b * s_count, -1), k)
        resp_g = resp_g.reshape(b, s_count, k)
        idx_g = idx_g.reshape(b, s_count, k)
        for j, i in enumerate(idxs_g):
            resp_list[i] = resp_g[:, j]
            idx_list[i] = idx_g[:, j]

    cand = []
    for p, resp, idx in zip(planes, resp_list, idx_list):
        valid = jnp.isfinite(resp)
        ww = p.spec.width
        x = (idx % ww).astype(jnp.float32)
        y = (idx // ww).astype(jnp.float32)
        s = p.spec
        ratio = np.float32(2.0**s.octave)
        size = np.float32(np.float32(s.esigma) * np.float32(cfg.derivative_factor))
        sigma_size = np.float32(np.round(size / ratio))
        # Border rejection (scale_space_extrema.rs:96-104), vectorized.
        smax = extrema.SMAX
        left = jnp.round(x - smax * sigma_size) - 1.0
        right = jnp.round(x + smax * sigma_size) + 1.0
        up = jnp.round(y - smax * sigma_size) - 1.0
        down = jnp.round(y + smax * sigma_size) + 1.0
        valid &= (left >= 0) & (right < s.width) & (up >= 0) & (down < s.height)
        off = np.float32(0.5) * (ratio - np.float32(1.0))
        cand.append(
            dict(
                spec=s,
                x=x,
                y=y,
                # octave-0 coords (with the +off shift applied once;
                # the sequential path's unshifted compare differs by
                # <= 1.5 px, far below the 4.8+ px radii)
                px=x * ratio + off,
                py=y * ratio + off,
                resp=jnp.where(valid, resp, -jnp.inf),
                idx=idx,
                valid=valid,
                size=size,
            )
        )

    if topk_method == "compact":
        # Compaction already emits candidates in pixel order with invalid
        # slots at the end — no sort needed.
        return cand

    # Candidates must be in (evolution-major, row-major pixel) order for the
    # sequential dedup: top_k returned response order, so re-sort each
    # evolution by pixel index (invalid slots pushed to the end) — one
    # vectorized argsort over all evolutions at once.
    fields = ("x", "y", "px", "py", "resp", "idx", "valid")
    stacked_f = {f: jnp.stack([c[f] for c in cand], axis=1) for f in fields}
    sort_key = jnp.where(
        stacked_f["valid"], stacked_f["idx"], jnp.iinfo(jnp.int32).max
    )
    order = jnp.argsort(sort_key, axis=-1)
    for f in fields:
        taken = jnp.take_along_axis(stacked_f[f], order, axis=-1)
        for e, c in enumerate(cand):
            c[f] = taken[:, e]
    return cand


def _compact_candidates(masked, k, chunk: int = 128):
    """Exact pixel-order compaction of sparse extrema candidates.

    ``masked``: (N, T) plane rows with non-candidates at -inf.  Returns
    ``(resp, idx)`` of the FIRST ``k`` candidates in pixel order (invalid
    slots -inf / clamped), replacing top_k + pixel-order argsort: identical
    output whenever the plane holds <= k candidates (the reference has no
    budget at all, so pixel-order-first is the faithful overflow policy).

    Mechanics: per-128-chunk candidate counts -> tiny cumsum ->
    ``searchsorted`` locates each output slot's chunk -> in-chunk rank via a
    128-wide prefix sum.  Cost is ~2 passes over the plane + O(k) work; no
    large sort.
    """
    n, total = masked.shape
    pad = (-total) % chunk
    if pad:
        masked = jnp.pad(masked, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    nch = masked.shape[1] // chunk
    ch = masked.reshape(n, nch, chunk)
    fin = jnp.isfinite(ch)
    counts = jnp.sum(fin, axis=-1, dtype=jnp.int32)  # (N, C)
    csum = jnp.cumsum(counts, axis=1)  # inclusive
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)  # p-th candidate, 1-based
    # searchsorted(csum, p, left) == count of chunks with csum < p: one
    # fused compare+reduce instead of the gather-loop searchsorted lowering
    # (measured several ms at this width on TPU).
    cidx = jnp.sum(
        csum[:, None, :] < targets[None, :, None], axis=-1, dtype=jnp.int32
    )
    cidx = jnp.minimum(cidx, nch - 1).astype(jnp.int32)
    prev = jnp.where(
        cidx > 0,
        jnp.take_along_axis(csum, jnp.maximum(cidx - 1, 0), axis=1),
        0,
    )
    rank = targets[None, :] - 1 - prev  # 0-based rank within the chunk
    chunk_vals = jnp.take_along_axis(ch, cidx[:, :, None], axis=1)  # (N, k, 128)
    chunk_fin = jnp.isfinite(chunk_vals)
    prefix = jnp.cumsum(chunk_fin.astype(jnp.int32), axis=-1)
    hit = chunk_fin & (prefix == rank[:, :, None] + 1)
    pos_in = jnp.argmax(hit, axis=-1).astype(jnp.int32)  # (N, k)
    valid = targets[None, :] <= csum[:, -1][:, None]
    idx = cidx * chunk + pos_in
    resp = jnp.take_along_axis(chunk_vals, pos_in[:, :, None], axis=-1)[..., 0]
    resp = jnp.where(valid, resp, -jnp.inf)
    idx = jnp.where(valid, jnp.minimum(idx, total - 1), total - 1)
    return resp, idx


def _block_top_k(masked, k):
    """top_k over a (B, H, W) masked extrema plane via 2x2 block maxima.

    A strict 3x3 local maximum excludes all 8-neighbors, so each 2x2 block
    holds at most one candidate: the block max + its in-block argmax lose
    nothing, and the global top_k runs over a 4x smaller array.  Returns
    responses and flat pixel indices like ``jax.lax.top_k`` on the raw plane.
    """
    b, h, w = masked.shape
    pad_h, pad_w = (-h) % 2, (-w) % 2
    if pad_h or pad_w:
        masked = jnp.pad(
            masked, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-jnp.inf
        )
    hb, wb = masked.shape[1] // 2, masked.shape[2] // 2
    blocks = masked.reshape(b, hb, 2, wb, 2)
    # Compare the 4 block members explicitly; track the winner's flat index.
    vals = [blocks[:, :, dy, :, dx] for dy in (0, 1) for dx in (0, 1)]
    cols = jnp.arange(wb, dtype=jnp.int32)[None, None, :] * 2
    rows = jnp.arange(hb, dtype=jnp.int32)[None, :, None] * 2
    idxs = [
        (rows + dy) * w + (cols + dx) for dy in (0, 1) for dx in (0, 1)
    ]
    best_v, best_i = vals[0], jnp.broadcast_to(idxs[0], vals[0].shape)
    for v, i in zip(vals[1:], idxs[1:]):
        take = v > best_v
        best_v = jnp.where(take, v, best_v)
        best_i = jnp.where(take, i, best_i)
    r, pos = jax.lax.top_k(best_v.reshape(b, -1), k)
    idx = jnp.take_along_axis(best_i.reshape(b, -1), pos, axis=1)
    return r, idx


# ---------------------------------------------------------------------------
# Stage 2: cross-scale dedup (conflict prefilter + exact sequential scan)
# ---------------------------------------------------------------------------


def stage_dedup(cand, k, scan_cap):
    """Exact sequential dedup as a device scan (vmapped over frames).

    Candidates with no conflict inside a conservative superset radius bypass
    the scan as definite survivors; only conflicted ones are compacted into
    the (capped) sequential scan.  Updates each ``cand[e]['valid']``.
    """
    b = cand[0]["x"].shape[0]
    n_evo = len(cand)
    ratios = [np.float32(2.0 ** c["spec"].octave) for c in cand]
    px_cmp = jnp.concatenate([c["x"] * r for c, r in zip(cand, ratios)], axis=1)
    py_cmp = jnp.concatenate([c["y"] * r for c, r in zip(cand, ratios)], axis=1)
    px_store = jnp.concatenate([c["px"] for c in cand], axis=1)
    py_store = jnp.concatenate([c["py"] for c in cand], axis=1)
    resp_all = jnp.concatenate([c["resp"] for c in cand], axis=1)
    cls_all = jnp.concatenate(
        [jnp.full((b, k), e, jnp.int32) for e in range(n_evo)], axis=1
    )
    size2_all = jnp.concatenate(
        [jnp.full((b, k), c["size"] * c["size"], jnp.float32) for c in cand],
        axis=1,
    )
    valid_all = jnp.concatenate([c["valid"] for c in cand], axis=1)

    # Conflict prefilter: a candidate with NO other candidate of the
    # same or adjacent evolution within a conservative superset radius
    # can neither suppress nor be suppressed/replaced — it bypasses the
    # sequential scan as a definite survivor (exactness preserved; the
    # slack covers the shifted-vs-unshifted coordinate variants used in
    # the scan's comparisons). This typically shortens the scan 2-4x.
    #
    # Slack: the scan compares the tested (later) candidate's *unshifted*
    # px_cmp against stored (shifted) coords; the prefilter uses stored
    # coords on both sides, so the per-pair slack is the tested side's
    # shift, sqrt(2)*0.5*(max_ratio_of_pair - 1) — ZERO for octave-0
    # pairs, which hold most candidates (the upper-scale suppression pass
    # compares stored coords on both sides and needs no slack at all).
    # Evaluated over stacked (B, E, K, K) tensors: two fused ops instead of
    # ~10 per evolution.
    def pair_slack(ra, rb):
        return 0.5 * (max(ra, rb) - 1.0) * np.sqrt(2.0) + 1e-3

    ratios_f = [float(r) for r in ratios]
    sizes_f = [float(c["size"]) for c in cand]
    r_self_vec = np.array(
        [
            (sizes_f[e] + pair_slack(ratios_f[e], ratios_f[e])) ** 2
            for e in range(n_evo)
        ],
        np.float32,
    )
    r_pair_vec = np.array(
        [
            (
                max(sizes_f[e], sizes_f[e + 1])
                + pair_slack(ratios_f[e], ratios_f[e + 1])
            )
            ** 2
            for e in range(n_evo - 1)
        ],
        np.float32,
    )

    px_s = px_store.reshape(b, n_evo, k)
    py_s = py_store.reshape(b, n_evo, k)
    val_s = valid_all.reshape(b, n_evo, k)

    dx = px_s[:, :, :, None] - px_s[:, :, None, :]
    dy = py_s[:, :, :, None] - py_s[:, :, None, :]
    close = (dx * dx + dy * dy) <= jnp.asarray(r_self_vec)[None, :, None, None]
    close &= ~jnp.eye(k, dtype=bool)[None, None]  # self-distance never counts
    close &= val_s[:, :, None, :] & val_s[:, :, :, None]
    conflicted = jnp.any(close, axis=-1)  # (B, E, K)

    dxa = px_s[:, :-1, :, None] - px_s[:, 1:, None, :]
    dya = py_s[:, :-1, :, None] - py_s[:, 1:, None, :]
    close_a = (dxa * dxa + dya * dya) <= jnp.asarray(r_pair_vec)[None, :, None, None]
    close_a &= val_s[:, :-1, :, None] & val_s[:, 1:, None, :]
    lo_hit = jnp.any(close_a, axis=-1)  # (B, E-1, K): lower evo vs upper
    hi_hit = jnp.any(close_a, axis=-2)  # (B, E-1, K): upper evo vs lower
    zpad = jnp.zeros((b, 1, k), bool)
    conflicted = (
        conflicted
        | jnp.concatenate([lo_hit, zpad], axis=1)
        | jnp.concatenate([zpad, hi_hit], axis=1)
    )

    conf_all = conflicted.reshape(b, n_evo * k) & valid_all
    c_total_slots = conf_all.shape[1]
    scan_cap = min(scan_cap, c_total_slots)
    # Stable compaction: conflicted candidates first, original order kept.
    comp_key = jnp.where(conf_all, 0, 1) * c_total_slots + jnp.arange(c_total_slots)
    comp_order = jnp.argsort(comp_key, axis=1)[:, :scan_cap]

    def takec(a):
        return jnp.take_along_axis(a, comp_order, axis=1)

    # Conflicted candidates occupy a prefix after compaction; bound the
    # sequential scan by the per-frame conflict count (a vmapped while_loop
    # costs max-over-batch steps instead of the static cap).
    n_steps = jnp.minimum(
        jnp.sum(conf_all, axis=1).astype(jnp.int32), jnp.int32(scan_cap)
    )
    survive_scan = jax.vmap(extrema.dedup_scan_device)(
        takec(px_cmp),
        takec(py_cmp),
        takec(px_store),
        takec(py_store),
        takec(resp_all),
        takec(cls_all),
        takec(size2_all),
        takec(valid_all & conf_all),
        n_steps,
    )
    # Scatter scan survivors back. Non-conflicted valid candidates pass
    # straight through, as do conflicted candidates beyond the scan cap
    # (keep-don't-drop overflow policy, like the other fixed budgets).
    conf_rank = jnp.cumsum(conf_all.astype(jnp.int32), axis=1) - 1
    overflow = conf_all & (conf_rank >= scan_cap)
    survive = valid_all & (~conf_all | overflow)
    survive = survive.at[jnp.arange(b)[:, None], comp_order].max(survive_scan)
    for e in range(n_evo):
        cand[e]["valid"] = survive[:, e * k : (e + 1) * k]
    return cand


# ---------------------------------------------------------------------------
# Stage 3: flat plane buffers + static per-slot tables
# ---------------------------------------------------------------------------


def flat_ldet_buffer(planes):
    """One 1-D Ldet buffer spanning all evolutions, so the subpixel stage's
    samples are 1-D gathers with per-keypoint base offsets (the fastest
    gather form on TPU)."""
    b = planes[0].ldet.shape[0]
    return jnp.concatenate([p.ldet.reshape(b, -1) for p in planes], axis=1)


def flat_pack_buffer(planes):
    """Packed (Lt, Lx, Ly) 1-D buffer for the gather sampler: all three
    planes fetched with ONE index-bound gather (trailing 3-slice)."""
    b = planes[0].ldet.shape[0]
    return jnp.concatenate(
        [
            jnp.stack(
                [p.lt.reshape(b, -1), p.lx.reshape(b, -1), p.ly.reshape(b, -1)],
                axis=-1,
            )
            for p in planes
        ],
        axis=1,
    )


def padded_plane_stack(planes):
    """(B*n_evo, 3, Hp, Wp) zero-padded (Lt, Lx, Ly) stack: the shared
    sampling source for orientation and one-hot M-LDB.

    Channel-MAJOR on purpose: a trailing channel dim of 3 would land in the
    TPU lane dimension and be tile-padded 3 -> 128 (a 42x memory/bandwidth
    blowup, measured: a (104, 512, 1392, 3) f32 output allocates 37.9 GB);
    with channels ahead of (H, W) the tiled dims are the full image planes.
    """
    b = planes[0].ldet.shape[0]
    n_evo = len(planes)
    h, w = planes[0].lt.shape[-2], planes[0].lt.shape[-1]
    # Round up to 128 multiples: the tile-quadrant select kernel
    # (pallas_mldb.select_samples_tiles) indexes (128, 128) blocks.
    hp = -(-max(128, h) // 128) * 128
    wp = -(-max(128, w) // 128) * 128
    # One fused concatenate of zero-padded per-evolution stacks.  (A chain of
    # ``stack.at[:, e].set(...)`` writes copied the full 890 MB buffer once
    # per evolution — measured ~20 ms at B=8; this form writes it once.)
    padded = []
    for p in planes:
        s = jnp.stack([p.lt, p.lx, p.ly], axis=1)  # (B, 3, H_o, W_o)
        ph, pw_ = hp - s.shape[-2], wp - s.shape[-1]
        padded.append(jnp.pad(s, ((0, 0), (0, 0), (0, ph), (0, pw_)))[:, None])
    return jnp.concatenate(padded, axis=1).reshape(b * n_evo, 3, hp, wp)


def padded_plane_stack_interleaved(planes):
    """(B*n_evo, Hp, 3*Wp) pixel-interleaved (Lt, Lx, Ly) stack: lane index
    ``3*x + ch``.

    The describe stage's patch cut is gather-ROW-latency bound (~12-18 ns
    per row regardless of slice width — docs/perf-notes.md round 4), so a
    channel-major (1, 3, 128, 128) patch slice costs 384 row fetches.  With
    channels interleaved on the lane axis the same patch is ONE
    (1, 128, 384) slice = 128 rows.  A trailing channel dim of 3 would be
    lane-padded 3 -> 128 (42x blowup, see :func:`padded_plane_stack`);
    interleaving keeps the lane dim at full image width.  Built with
    interior-padded adds — never materializing a (..., W, 3) intermediate.
    """
    b = planes[0].ldet.shape[0]
    n_evo = len(planes)
    h, w = planes[0].lt.shape[-2], planes[0].lt.shape[-1]
    hp = -(-max(128, h) // 128) * 128
    wp = -(-max(128, w) // 128) * 128
    out = []
    for p in planes:
        ho, wo = p.lt.shape[-2], p.lt.shape[-1]
        chans = []
        for ch, arr in enumerate((p.lt, p.lx, p.ly)):
            # interior=2 spreads x to lane 3*x; low=ch shifts channel ch into
            # place; high pads to the 3*wp tile width in the same op.
            chans.append(
                jax.lax.pad(
                    arr,
                    jnp.zeros((), arr.dtype),
                    [(0, 0, 0), (0, hp - ho, 0), (ch, (2 - ch) + 3 * (wp - wo), 2)],
                )
            )
        out.append((chans[0] + chans[1] + chans[2])[:, None])
    return jnp.concatenate(out, axis=1).reshape(b * n_evo, hp, 3 * wp)


def slot_tables(cfg, specs, k):
    """Static per-slot numpy tables over the concatenated candidate axis."""
    n_evo = len(specs)
    sizes_px = [s.height * s.width for s in specs]
    bases = np.concatenate([[0], np.cumsum(sizes_px)[:-1]]).astype(np.int32)
    return dict(
        slot_cls=np.repeat(np.arange(n_evo), k).astype(np.int32),
        width=np.array([s.width for s in specs], np.int32),
        height=np.array([s.height for s in specs], np.int32),
        base=bases,
        power=np.array([2.0**s.octave for s in specs], np.float32),
        octave=np.array([s.octave for s in specs], np.int32),
        size2x=np.array(
            [
                np.float32(np.float32(s.esigma) * np.float32(cfg.derivative_factor))
                * np.float32(2.0)
                for s in specs
            ],
            np.float32,
        ),
        ssamp=np.array(
            [
                np.float32(
                    np.round(
                        np.float32(np.float32(s.esigma) * cfg.derivative_factor)
                        / np.float32(2.0**s.octave)
                    )
                )
                for s in specs
            ],
            np.float32,
        ),
    )


# ---------------------------------------------------------------------------
# Stage 4: subpixel refinement + global top-M selection
# ---------------------------------------------------------------------------


def stage_refine_select(cfg, specs, cand, planes, k, max_features, slack=128):
    """Preselect the top (M + slack) candidates by response, subpixel-refine
    only those, then compact the final top-M to (B, M) selection arrays.

    Refinement never changes a response — it only *drops* keypoints with
    |delta| > 1 — so refining the top (M + slack) is exact unless more than
    ``slack`` of them fail refinement (goldens + exact-path tests gate it).
    This cuts the 9 Ldet samples from all E*K candidate slots to M + slack,
    gathered per octave group straight from the stacked Ldet planes (the
    stacks CSE with stage_candidates' — no flat concat buffer at all).
    """
    b = planes[0].ldet.shape[0]
    n_evo = len(specs)
    t = slot_tables(cfg, specs, k)
    c_total = n_evo * k

    x_all = jnp.concatenate([c["x"] for c in cand], axis=1).astype(jnp.int32)
    y_all = jnp.concatenate([c["y"] for c in cand], axis=1).astype(jnp.int32)
    resp_ok = jnp.where(
        jnp.concatenate([c["valid"] for c in cand], axis=1),
        jnp.concatenate([c["resp"] for c in cand], axis=1),
        -jnp.inf,
    )

    # Preselect by response (refinement is response-preserving).
    m = min(max_features, c_total)
    pre_m = min(m + slack, c_total)
    resp1, idx1 = jax.lax.top_k(resp_ok, pre_m)  # (B, P)
    cls1 = jnp.asarray(t["slot_cls"])[idx1]
    x1 = jnp.take_along_axis(x_all, idx1, axis=1)
    y1 = jnp.take_along_axis(y_all, idx1, axis=1)

    sw = jnp.asarray(t["width"])[cls1]
    sh = jnp.asarray(t["height"])[cls1]
    xs = jnp.clip(x1, 1, sw - 2)
    ys = jnp.clip(y1, 1, sh - 2)

    # Octave-group gathers: for each group, one take per stencil offset over
    # the group's stacked (B, S*H*W) Ldet, merged by group membership.
    groups = []
    for i, p in enumerate(planes):
        shape = p.ldet.shape[-2:]
        if groups and groups[-1][0] == shape:
            groups[-1][1].append(i)
        else:
            groups.append([shape, [i]])

    offsets = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    samples = {o: jnp.zeros_like(resp1) for o in offsets}

    def take3(flat, start):
        """flat (T,), start (P,) -> (P, 3): 3 consecutive elements per
        index.  Gather cost on TPU is index-bound (~18 ns/index), so one
        3-wide slice costs the same as one scalar take — this fetches each
        stencil ROW with one index instead of three."""
        return jax.lax.gather(
            flat,
            start[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
            ),
            slice_sizes=(3,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    for (h_g, w_g), idxs_g in groups:
        stacked = jnp.stack([planes[i].ldet for i in idxs_g], axis=1)
        flat_g = stacked.reshape(b, -1)
        first = idxs_g[0]
        in_g = (cls1 >= first) & (cls1 < first + len(idxs_g))
        lvl_loc = jnp.clip(cls1 - first, 0, len(idxs_g) - 1)
        xs_g = jnp.clip(x1, 1, w_g - 2)
        ys_g = jnp.clip(y1, 1, h_g - 2)
        center_g = (lvl_loc * h_g + ys_g) * w_g + xs_g
        for dy in (-1, 0, 1):
            row = jax.vmap(take3)(flat_g, center_g + dy * w_g - 1)  # (B, P, 3)
            for dx in (-1, 0, 1):
                val = row[..., dx + 1]
                samples[(dx, dy)] = jnp.where(in_g, val, samples[(dx, dy)])

    def at(dx, dy):
        return samples[(dx, dy)]

    v = at(0, 0)
    d_x = 0.5 * (at(1, 0) - at(-1, 0))
    d_y = 0.5 * (at(0, 1) - at(0, -1))
    d_xx = at(1, 0) + at(-1, 0) - 2.0 * v
    d_yy = at(0, 1) + at(0, -1) - 2.0 * v
    d_xy = 0.25 * (at(1, 1) + at(-1, -1)) - 0.25 * (at(1, -1) + at(-1, 1))
    inv_det = 1.0 / (d_xx * d_yy - d_xy * d_xy)
    dst0 = -d_x * (inv_det * d_yy) + -d_y * (inv_det * -d_xy)
    dst1 = -d_x * (inv_det * -d_xy) + -d_y * (inv_det * d_xx)
    refine_ok = (jnp.abs(dst0) <= 1.0) & (jnp.abs(dst1) <= 1.0)
    resp1 = jnp.where(refine_ok, resp1, -jnp.inf)
    pw = jnp.asarray(t["power"])[cls1]
    px = (xs.astype(jnp.float32) + dst0) * pw + 0.5 * (pw - 1.0)
    py = (ys.astype(jnp.float32) + dst1) * pw + 0.5 * (pw - 1.0)

    # Final top-M among the refined preselection.
    top_resp, top_idx = jax.lax.top_k(resp1, m)  # (B, M)

    def take(a):
        return jnp.take_along_axis(a, top_idx, axis=1)

    sel_cls = take(cls1)
    sel = dict(
        resp=top_resp,
        cls=sel_cls,
        base=jnp.asarray(t["base"])[sel_cls],
        w=jnp.asarray(t["width"])[sel_cls],
        h=jnp.asarray(t["height"])[sel_cls],
        pw=jnp.asarray(t["power"])[sel_cls],
        size=jnp.asarray(t["size2x"])[sel_cls],
        ssamp=jnp.asarray(t["ssamp"])[sel_cls],
        oct=jnp.asarray(t["octave"])[sel_cls],
        px=take(px),
        py=take(py),
        valid=jnp.isfinite(top_resp),
    )
    return sel


# ---------------------------------------------------------------------------
# Stage 5: orientation + M-LDB descriptors
# ---------------------------------------------------------------------------


def stage_describe(cfg, planes, sel, sampler: str, onehot_mode: str = "highest"):
    """Dominant orientation then M-LDB words for the selected keypoints."""
    b, m = sel["resp"].shape
    n_evo = len(planes)
    xf = sel["px"] / sel["pw"]
    yf = sel["py"] / sel["pw"]

    if sampler == "onehot":
        # Fused orientation + M-LDB: one 128x128x3 patch extraction per
        # keypoint from the shared padded stack, all samples resolved by
        # factorized one-hot MXU selection (bitwise-equal to the gather
        # path; see descriptors.orient_mldb_onehot).  The '+inter' mode
        # suffix swaps the stack for the pixel-interleaved layout whose
        # patch cut is one (128, 384) slice per keypoint (3x fewer gather
        # rows; see padded_plane_stack_interleaved).
        interleaved = onehot_mode.endswith("+inter")
        if interleaved:
            onehot_mode = onehot_mode[: -len("+inter")]
            planes_padded = padded_plane_stack_interleaved(planes)
        else:
            planes_padded = padded_plane_stack(planes)
        lvl = (jnp.arange(b, dtype=jnp.int32)[:, None] * n_evo + sel["cls"]).reshape(-1)
        if onehot_mode.startswith("pgroups"):
            # Optional numeric suffix = window-groups per grid step
            # (e.g. 'pgroups4'); bare 'pgroups' = 1.
            pg_w = int(onehot_mode[len("pgroups"):] or "1")
            # Tile-coherent group describe: no patch cut, no patch buffer
            # (descriptors.orient_mldb_groups).  The static group cap comes
            # from the window catalog of this spec set.
            hp, wp = planes_padded.shape[-2], planes_padded.shape[-1]
            specs = [p.spec for p in planes]
            k_total = b * m
            ng_cap = -(-k_total // 8) + desc.window_catalog_size(
                specs, b, hp, wp
            ) + 1
            words, w_ok, angle = desc.orient_mldb_groups(
                planes_padded,
                lvl,
                sel["w"].reshape(-1),
                sel["h"].reshape(-1),
                xf.reshape(-1),
                yf.reshape(-1),
                sel["ssamp"].reshape(-1),
                sel["valid"].reshape(-1),
                pattern_size=cfg.descriptor_pattern_size,
                ng_cap=ng_cap,
                w=pg_w,
            )
        else:
            words, w_ok, angle = desc.orient_mldb_onehot(
                planes_padded,
                lvl,
                sel["w"].reshape(-1),
                sel["h"].reshape(-1),
                xf.reshape(-1),
                yf.reshape(-1),
                sel["ssamp"].reshape(-1),
                pattern_size=cfg.descriptor_pattern_size,
                # Bigger chunks amortize per-call overhead for the Pallas
                # gather kernel (fewer pallas_call launches under lax.map);
                # the XLA one-hot path keeps 128 to bound its HBM
                # intermediates.
                chunk=512 if onehot_mode in ("pgather", "pepatch", "pfused") else 128,
                mode=onehot_mode,
                interleaved=interleaved,
            )
        words = words.reshape(b, m, -1)
        w_ok = w_ok.reshape(b, m)
        angle = angle.reshape(b, m)
    else:
        flat_pack = flat_pack_buffer(planes)
        angle = jax.vmap(desc.orientation_flat)(
            flat_pack, sel["base"], sel["w"], sel["h"], xf, yf, sel["ssamp"]
        )
        words, w_ok = jax.vmap(
            partial(desc.mldb_flat, pattern_size=cfg.descriptor_pattern_size)
        )(flat_pack, sel["base"], sel["w"], sel["h"], xf, yf, sel["ssamp"], angle)

    return FeatureSet(
        point=jnp.stack([sel["px"], sel["py"]], axis=-1),
        response=sel["resp"],
        size=sel["size"],
        angle=angle,
        octave=sel["oct"],
        class_id=sel["cls"],
        words=words,
        valid=sel["valid"] & w_ok,
    )


class FastAkazeExtractor:
    """Engine-facing adapter over :class:`DeviceExtractor`.

    Implements the same ``extract(image) -> (keypoints_dict, words)``
    contract as :class:`cv_tpu.akaze.extract.AkazeExtractor` (the contract
    ``VSlam.kps_descriptors`` consumes, lib.rs:2195-2236), but runs the
    fully-device batched pipeline: the fixed-budget :class:`FeatureSet` is
    mask-compacted to host arrays, already sorted by response descending
    (the device pipeline's top-k order).  Inject into the engine via
    ``VSlam(extractor_cls=FastAkazeExtractor)``.
    """

    def __init__(
        self,
        config: Akaze | None = None,
        candidate_budget: int | None = None,
        max_features: int | None = None,
    ):
        self.config = config or Akaze()
        # Honor the config's feature budget as-is: the reference defaults to
        # 8192 tracked features (cv-sfm/src/settings.rs:469-471) and the
        # engine passes tracking_features straight through — a silent cap
        # here ran "reference-scale" sessions at 1/4 budget (round-3
        # verdict).  Callers wanting a smaller device budget pass
        # max_features explicitly.
        m = max_features or self.config.maximum_features
        if candidate_budget is None:
            # Per-evolution candidate slots must not bound the global budget:
            # with ~13 evolutions a flat 512/level capped extraction at
            # ~6.6k.  Scale with the budget (2x headroom over an even split
            # across ~8 effective levels; fine levels hold most extrema).
            candidate_budget = max(512, m // 4)
        self._dev = DeviceExtractor(
            self.config,
            candidate_budget=candidate_budget,
            max_features=m,
            # The dedup scan must cover the conflicted-candidate count or
            # the keep-don't-drop overflow policy lets duplicates crowd the
            # budget at dense thresholds (the flat 1024 default overflowed
            # at reference scale — round-5 dense-anchor finding; exact
            # dedup at 8192 cut refscale landmarks 164k -> 39k real,
            # docs/refscale-run-v3.md).  The floor stays 1024: small-budget
            # engine scenarios keep a bounded dup fringe (974 real vs a
            # saturated 1024 measured on a 512x640 frame at m=1024) and the
            # multi-seed merge scenarios are calibrated against it; callers
            # wanting exact small-budget dedup pass dedup_scan_cap
            # explicitly.
            dedup_scan_cap=max(1024, m),
        )

    def extract(self, image: np.ndarray):
        """Sketch-free extraction: skips the fused LSH subgraph entirely
        (callers that discard the sketch — codebook training, benches —
        shouldn't pay the N x 512 popcount matmul per frame)."""
        from .extract import to_gray_f32

        img = to_gray_f32(image)
        fs = self._dev.extract(jnp.asarray(img)[None])
        host = jax.device_get(
            (fs.valid[0], fs.point[0], fs.response[0], fs.size[0],
             fs.angle[0], fs.octave[0], fs.class_id[0], fs.words[0])
        )
        valid, point, response, size, angle, octave, class_id, words = host
        kp = {
            "point": point[valid],
            "response": response[valid],
            "size": size[valid],
            "angle": angle[valid],
            "octave": octave[valid],
            "class_id": class_id[valid],
        }
        return kp, words[valid]

    def extract_with_sketch(self, image: np.ndarray):
        """Extract plus the frame's LSH sketch, fused into the same XLA
        program (the engine otherwise pays a separate device dispatch for
        ``lsh.hash_bag``, lib.rs:210-220).  All outputs come back in ONE
        batched device->host fetch — through a remote-device tunnel each
        fetch costs ~tens of ms, so one fetch instead of eight dominates
        per-frame latency."""
        return self.fetch_extract(self.dispatch_extract(image))

    def dispatch_extract(self, image: np.ndarray):
        """Phase 1 of :meth:`extract_with_sketch`: enqueue the device
        extraction and return unfetched device arrays.  Lets a caller
        pipeline frame n+1's extraction behind frame n's engine work
        (``VSlam.prefetch_extract``) — the device runs the extract during
        host-side gaps instead of the host blocking on it."""
        from .extract import to_gray_f32

        img = to_gray_f32(image)
        return self._dev.extract_sketch(jnp.asarray(img)[None])

    def fetch_extract(self, handle):
        """Phase 2: one batched device->host fetch of a
        :meth:`dispatch_extract` handle -> ``(kp dict, words, sketch)``."""
        fs, sketch = handle
        host = jax.device_get(
            (fs.valid[0], fs.point[0], fs.response[0], fs.size[0],
             fs.angle[0], fs.octave[0], fs.class_id[0], fs.words[0], sketch)
        )
        valid, point, response, size, angle, octave, class_id, words, sk = host
        kp = {
            "point": point[valid],
            "response": response[valid],
            "size": size[valid],
            "angle": angle[valid],
            "octave": octave[valid],
            "class_id": class_id[valid],
        }
        return kp, words[valid], sk


class DeviceExtractor:
    """Jit-compiled batched extractor for a fixed image shape.

    ``candidate_budget``: max extrema kept per evolution (top-k by response).
    ``max_features``: final per-frame feature budget M.
    """

    def __init__(
        self,
        config: Akaze | None = None,
        candidate_budget: int = 256,
        max_features: int = 1024,
        sampler: str = "onehot",
        dedup_scan_cap: int = 1024,
        topk_method: str = "compact",
        onehot_mode: str | None = None,
        diffusion_dtype=None,
    ):
        self.config = config or Akaze()
        self.candidate_budget = candidate_budget
        self.max_features = max_features
        # 'onehot' (gather-free MXU sampling, fastest on TPU) or 'gather'
        # (flat 1-D gathers); both are bitwise-identical.
        self.sampler = sampler
        # Max conflicted candidates resolved by the sequential scan; the
        # conflict prefilter usually leaves far fewer than the raw budget.
        self.dedup_scan_cap = dedup_scan_cap
        # Candidate selection: 'compact' (exact pixel-order compaction,
        # fastest), 'block'/'raw' (exact strongest-K top_k), 'approx'
        # (experimental); see stage_candidates.
        self.topk_method = topk_method
        # Sample-selection strategy, all bit-identical (tests/test_pallas_mldb
        # + on-device words-equality checks):
        #   'pgather'  Pallas per-tile hardware dynamic-gather kernel
        #              (pallas_mldb.select_samples_gather) — TPU default,
        #              wins 41.9 vs 45.2 ms/batch at B=8 (exp_r3_pgather.py)
        #   'highest'  f32 one-hot MXU einsum at Precision.HIGHEST — CPU
        #              default (Pallas interpret mode is a per-grid-step
        #              Python loop; XLA is far faster there)
        #   'pallas'/'bf16x3'/'bf16x3k'  measured losers, kept for experiments
        #              (device timings in docs/perf-notes.md round-3)
        if onehot_mode is None:
            # 'pgather'/'pgroups' rely on TPU-only Mosaic dynamic_gather;
            # any other backend (CPU, GPU) gets the portable XLA one-hot
            # path.  At large feature budgets the tile-coherent group
            # describe wins big (M=4096, B=8: 67 vs 131 ms/batch — the XLA
            # patch cut is a per-row gather wall that scales with K), while
            # at the bench's M=512 the patch path stays marginally ahead
            # (38.8 vs 40.3 ms); exp_r5_pgroups device A/B, round 5.
            if jax.default_backend() == "tpu":
                onehot_mode = "pgroups" if max_features >= 2048 else "pgather"
            else:
                onehot_mode = "highest"
        self.onehot_mode = onehot_mode
        # Opt-in reduced-precision diffusion (e.g. jnp.bfloat16): halves the
        # HBM traffic of the scale-space build at a small, bounded keypoint
        # drift — NOT golden-exact; see build_scale_space.  Off by default.
        self.diffusion_dtype = diffusion_dtype
        from .extract import AkazeExtractor

        self._helper = AkazeExtractor(self.config)

    # -- jitted pipeline -----------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def extract(self, images: jnp.ndarray) -> FeatureSet:
        """``images``: (B, H, W) float32 in [0, 1] -> FeatureSet."""
        cfg = self.config
        b, h, w = images.shape
        specs = self._helper.specs(h, w)
        planes = build_scale_space(
            cfg, specs, images, diffusion_dtype=self.diffusion_dtype
        )
        k = self.candidate_budget
        cand = stage_candidates(cfg, specs, planes, k, self.topk_method)
        cand = stage_dedup(cand, k, self.dedup_scan_cap)
        sel = stage_refine_select(cfg, specs, cand, planes, k, self.max_features)
        return stage_describe(cfg, planes, sel, self.sampler, self.onehot_mode)

    @partial(jax.jit, static_argnames=("self",))
    def extract_sketch(self, images: jnp.ndarray):
        """``extract`` plus the per-frame LSH bag-of-words sketch
        (lib.rs:210-220) computed in the same program.  Only makes sense for
        B=1 (one sketch per frame); returns ``(FeatureSet, (16,) uint32)``."""
        from ..matching import lsh

        fs = self.extract(images)
        words = fs.words[0]
        valid = fs.valid[0]
        cw = jnp.asarray(lsh.codewords())
        d = lsh.distance_matrix(words, cw)
        sketch = lsh.sketch_from_distances(d, valid)
        return fs, sketch
