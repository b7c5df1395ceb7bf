"""Scale-space extrema detection, dedup, and sub-pixel refinement.

Re-design of ``/root/reference/akaze/src/scale_space_extrema.rs``.

Split of labor:
* ``candidate_mask`` (device): thresholded strict 3x3 maxima as shifted-array
  comparisons over the whole Ldet plane — the reference's 9-iterator sweep
  (scale_space_extrema.rs:23-59) becomes one fused VPU pass.
* ``dedup_keypoints_exact`` (host, NumPy/f32): bit-faithful replica of the
  order-dependent same/lower-scale dedup with in-place replacement
  (scale_space_extrema.rs:75-117) and the upper-scale suppression pass
  (:120-140). Candidate counts are small (hundreds..thousands), so this is
  cheap; a batched device NMS serves the throughput path.
* ``subpixel_refine`` (device): batched 2x2 Newton step on the Ldet Hessian
  (scale_space_extrema.rs:297-362) over a fixed keypoint budget with masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

SMAX = np.float32(10.0) * np.sqrt(np.float32(2.0))


def candidate_mask(ldet: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Strict 3x3 maxima above threshold, border-excluded.

    ``ldet`` is ``(..., H, W)``; returns a bool mask of the same shape.
    """
    h, w = ldet.shape[-2], ldet.shape[-1]
    c = ldet[..., 1:-1, 1:-1]
    # Strict max over the 8-neighborhood as c > max(neighbors), built from
    # a horizontal 3-max so only two lane-shifted copies are materialized
    # (each dx shift relayouts the whole plane on TPU — the naive 8-compare
    # form pays six of them and measured ~16x slower than this).
    row3 = jnp.maximum(
        ldet[..., :, : w - 2], jnp.maximum(ldet[..., :, 1 : w - 1], ldet[..., :, 2:])
    )  # (..., H, W-2) horizontal 3-max centered at x+1
    nmax = jnp.maximum(
        jnp.maximum(row3[..., : h - 2, :], row3[..., 2:, :]),  # rows y-1, y+1 full 3-max
        jnp.maximum(ldet[..., 1:-1, : w - 2], ldet[..., 1:-1, 2:]),  # row y: x-1, x+1
    )
    m = (c > jnp.float32(threshold)) & (c > nmax)
    return jnp.pad(m, [(0, 0)] * (ldet.ndim - 2) + [(1, 1), (1, 1)])


@dataclasses.dataclass
class Candidates:
    """Host-side raw candidates of one evolution, row-major order."""

    e_id: int
    octave: int
    esigma: float
    width: int
    height: int
    xs: np.ndarray  # int32
    ys: np.ndarray  # int32
    responses: np.ndarray  # float32


def extract_candidates(specs, masks, responses) -> list[Candidates]:
    """Convert device masks to host candidate lists (row-major order)."""
    out = []
    for spec, m, r in zip(specs, masks, responses):
        ys, xs = np.nonzero(np.asarray(m))
        out.append(
            Candidates(
                e_id=spec.index,
                octave=spec.octave,
                esigma=spec.esigma,
                width=spec.width,
                height=spec.height,
                xs=xs.astype(np.int32),
                ys=ys.astype(np.int32),
                responses=np.asarray(r)[ys, xs].astype(np.float32),
            )
        )
    return out


def dedup_keypoints_exact(
    candidates: list[Candidates], derivative_factor: float
) -> dict[str, np.ndarray]:
    """The reference's sequential dedup (scale_space_extrema.rs:60-143).

    All arithmetic in f32 to mirror the reference. Returns keypoint arrays:
    ``point`` (octave-0 coords, pre-subpixel), ``response``, ``size``
    (esigma * derivative_factor, pre-doubling), ``octave``, ``class_id``,
    and the integer octave-coords ``ix``/``iy`` for the refinement gather.
    """
    cache_pt = np.zeros((0, 2), np.float32)
    cache_resp = np.zeros((0,), np.float32)
    cache_class = np.zeros((0,), np.int64)
    cache_size = np.zeros((0,), np.float32)
    cache_ixy = np.zeros((0, 2), np.int32)
    cache_octave = np.zeros((0,), np.int64)

    for cand in candidates:
        if len(cand.xs) == 0:
            continue
        ratio = np.float32(2.0) ** np.float32(cand.octave)
        size = np.float32(cand.esigma * derivative_factor)
        size2 = size * size
        sigma_size = np.float32(np.round(size / ratio))
        w, h = np.float32(cand.width), np.float32(cand.height)
        off = np.float32(0.5) * (ratio - np.float32(1.0))
        for x, y, resp in zip(cand.xs, cand.ys, cand.responses):
            px = np.float32(x) * ratio  # no +off during dedup (":81-83")
            py = np.float32(y) * ratio
            # Compare with cached keypoints of same or lower-adjacent class.
            cls_ok = (cache_class == cand.e_id) | (cache_class == cand.e_id - 1)
            is_repeated = False
            is_extremum = True
            id_repeated = -1
            if cls_ok.any():
                idxs = np.nonzero(cls_ok)[0]
                dx = px - cache_pt[idxs, 0]
                dy = py - cache_pt[idxs, 1]
                dist = dx * dx + dy * dy
                close = dist <= size2
                if close.any():
                    k = idxs[np.argmax(close)]  # first close one (break)
                    if resp > cache_resp[k]:
                        is_repeated = True
                        id_repeated = k
                    else:
                        is_extremum = False
            if not is_extremum:
                continue
            # Border check in this evolution's coords (":96-104").
            left = np.float32(np.round(np.float32(x) - SMAX * sigma_size)) - 1.0
            right = np.float32(np.round(np.float32(x) + SMAX * sigma_size)) + 1.0
            up = np.float32(np.round(np.float32(y) - SMAX * sigma_size)) - 1.0
            down = np.float32(np.round(np.float32(y) + SMAX * sigma_size)) + 1.0
            if left < 0 or right >= w or up < 0 or down >= h:
                continue
            pt = np.array([np.float32(x) * ratio + off, np.float32(y) * ratio + off], np.float32)
            if is_repeated:
                cache_pt[id_repeated] = pt
                cache_resp[id_repeated] = resp
                cache_class[id_repeated] = cand.e_id
                cache_size[id_repeated] = size
                cache_ixy[id_repeated] = (x, y)
                cache_octave[id_repeated] = cand.octave
            else:
                cache_pt = np.concatenate([cache_pt, pt[None]], axis=0)
                cache_resp = np.append(cache_resp, resp)
                cache_class = np.append(cache_class, cand.e_id)
                cache_size = np.append(cache_size, size)
                cache_ixy = np.concatenate(
                    [cache_ixy, np.array([[x, y]], np.int32)], axis=0
                )
                cache_octave = np.append(cache_octave, cand.octave)

    # Upper-scale suppression (":120-140").
    n = len(cache_resp)
    keep = np.ones(n, bool)
    for i in range(n):
        js = np.arange(i + 1, n)
        if len(js) == 0:
            break
        upper = cache_class[js] == cache_class[i] + 1
        if not upper.any():
            continue
        js = js[upper]
        d = cache_pt[js] - cache_pt[i]
        dist = d[:, 0] ** 2 + d[:, 1] ** 2
        hit = (dist <= cache_size[i] * cache_size[i]) & (
            cache_resp[i] <= cache_resp[js]
        )
        if hit.any():
            keep[i] = False

    return {
        "point": cache_pt[keep],
        "response": cache_resp[keep],
        "size": cache_size[keep],
        "class_id": cache_class[keep],
        "octave": cache_octave[keep],
        "ixy": cache_ixy[keep],
    }


def dedup_scan_device(
    px_cmp: jnp.ndarray,  # (C,) unshifted octave-0 x = x * ratio
    py_cmp: jnp.ndarray,
    px_store: jnp.ndarray,  # (C,) shifted octave-0 coords (stored on insert)
    py_store: jnp.ndarray,
    resp: jnp.ndarray,  # (C,) f32
    class_id: jnp.ndarray,  # (C,) i32 evolution index
    size2: jnp.ndarray,  # (C,) f32 squared dedup radius of the candidate
    valid: jnp.ndarray,  # (C,) bool (threshold/extremum/border already applied)
    n_steps: jnp.ndarray | None = None,  # scalar i32: only the first n need scanning
) -> jnp.ndarray:
    """Exact device replica of the sequential dedup + upper-scale filter.

    Candidates MUST be ordered (evolution-major, row-major pixel order),
    exactly as the reference's iteration (scale_space_extrema.rs:17-117).
    Runs as a dynamically-bounded ``lax.while_loop`` over candidates
    maintaining the keypoint cache in fixed-size arrays — vmappable over a
    frame batch (a vmapped while_loop runs until the slowest lane is done,
    so the wall cost is max(n_steps) instead of the static cap).

    ``n_steps``: when the caller knows all valid candidates sit in a prefix
    (the conflict-compaction in :func:`cv_tpu.akaze.fast.stage_dedup` does
    this), passing the prefix length skips the no-op tail steps.

    Returns a (C,) bool mask over the *input candidate order*: True for
    candidates that survive as output keypoints.
    """
    c = px_cmp.shape[0]
    dtype = px_cmp.dtype
    if n_steps is None:
        n_steps = jnp.int32(c)
    init = (
        jnp.full((c,), jnp.inf, dtype),  # cache px (inf => no match)
        jnp.full((c,), jnp.inf, dtype),  # cache py
        jnp.zeros((c,), resp.dtype),  # cache resp
        jnp.full((c,), -2, jnp.int32),  # cache class (-2 never matches)
        jnp.zeros((c,), jnp.int32),  # cache src candidate index
        jnp.int32(0),  # count
    )

    iota_c = jnp.arange(c, dtype=jnp.int32)

    def step(state, cand):
        cpx, cpy, cresp, ccls, csrc, count = state
        i, pxc, pyc, pxs, pys, r, cls, s2, ok = cand
        cls_ok = (ccls == cls) | (ccls == cls - 1)
        dx = pxc - cpx
        dy = pyc - cpy
        close = cls_ok & ((dx * dx + dy * dy) <= s2)
        exists = jnp.any(close)
        first = jnp.argmax(close)
        # Masked-reduce read and iota-compare writes instead of dynamic
        # index/scatter ops: each .at[slot].set lowered to a dynamic lane
        # update, and five of them per candidate made the scan ~55 us per
        # 8-candidate iteration (~7 ms of the B=8 extract).  A one-hot
        # select is a single fused VPU pass over the (C,) cache.  The read
        # is exact: one nonzero term (responses are positive; init 0).
        prev_resp = jnp.sum(jnp.where(iota_c == first, cresp, 0.0))
        is_rep = exists & (r > prev_resp)
        dropped = (exists & ~is_rep) | ~ok
        slot = jnp.where(is_rep, first, count)
        write = ~dropped
        m = write & (iota_c == slot)
        cpx = jnp.where(m, pxs, cpx)
        cpy = jnp.where(m, pys, cpy)
        cresp = jnp.where(m, r, cresp)
        ccls = jnp.where(m, cls, ccls)
        csrc = jnp.where(m, i, csrc)
        count = count + jnp.where(write & ~is_rep, 1, 0).astype(jnp.int32)
        return (cpx, cpy, cresp, ccls, csrc, count)

    # Process UNROLL candidates per loop iteration: the body is tiny, so
    # TPU while-loop per-iteration overhead dominates — unrolling amortizes
    # it (steps beyond n_steps are no-ops because their valid flag is False
    # or they are clamped repeats with ok forced off).
    UNROLL = 8

    def read_at(arr, m_j):
        # Masked-reduce stream read: x[j] as a one-hot select + sum — a
        # single fused VPU pass, where a dynamic-index read lowers to a
        # dynamic lane slice (measured ~half the scan's cost across the 9
        # per-candidate reads).  Exact: one nonzero term.
        return jnp.sum(
            jnp.where(m_j, arr, jnp.zeros((), arr.dtype)), dtype=arr.dtype
        )

    def body(carry):
        i, state = carry
        for u in range(UNROLL):
            j = jnp.minimum(i + u, jnp.int32(c - 1))
            m_j = iota_c == j
            ok = jnp.any(m_j & valid) & (i + u < jnp.int32(c))
            cand = (
                j,
                read_at(px_cmp, m_j),
                read_at(py_cmp, m_j),
                read_at(px_store, m_j),
                read_at(py_store, m_j),
                read_at(resp, m_j),
                read_at(class_id, m_j),
                read_at(size2, m_j),
                ok,
            )
            state = step(state, cand)
        return (i + UNROLL, state)

    _, (cpx, cpy, cresp, ccls, csrc, count) = jax.lax.while_loop(
        lambda carry: carry[0] < n_steps, body, (jnp.int32(0), init)
    )

    # Upper-scale suppression over the final cache (":120-140"): entry i is
    # dropped when a *later slot* j of class_id+1 within radius size_i has
    # response >= resp_i.
    slot_used = jnp.arange(c) < count
    size2_cache = size2[csrc]
    dx = cpx[:, None] - cpx[None, :]
    dy = cpy[:, None] - cpy[None, :]
    dist2 = dx * dx + dy * dy
    later = jnp.arange(c)[None, :] > jnp.arange(c)[:, None]
    upper = ccls[None, :] == (ccls[:, None] + 1)
    hit = (
        later
        & upper
        & (dist2 <= size2_cache[:, None])
        & (cresp[:, None] <= cresp[None, :])
        & slot_used[None, :]
    )
    keep = slot_used & ~jnp.any(hit, axis=-1)
    # Scatter back to candidate order. Unused slots all carry csrc == 0, so
    # use a max-scatter to avoid them clobbering candidate 0.
    out = jnp.zeros((c,), jnp.int32)
    out = out.at[csrc].max((keep & slot_used).astype(jnp.int32))
    return out > 0


def subpixel_refine_batch(
    ldet: jnp.ndarray, ixy: jnp.ndarray, valid: jnp.ndarray
):
    """Batched 2x2 Newton refinement (scale_space_extrema.rs:297-345).

    ``ldet``: ``(S, H, W)`` stacked planes of one octave group;
    ``ixy``: ``(K, 3)`` int32 rows ``(sublevel, x, y)``; ``valid``: ``(K,)``.
    Returns ``(delta (K, 2), ok (K,))`` where ``ok`` requires ``|delta|<=1``
    componentwise (the reference drops failures).
    """
    s, x, y = ixy[:, 0], ixy[:, 1], ixy[:, 2]

    def at(dx, dy):
        return ldet[s, y + dy, x + dx]

    v = at(0, 0)
    d_x = 0.5 * (at(1, 0) - at(-1, 0))
    d_y = 0.5 * (at(0, 1) - at(0, -1))
    d_xx = at(1, 0) + at(-1, 0) - 2.0 * v
    d_yy = at(0, 1) + at(0, -1) - 2.0 * v
    d_xy = 0.25 * (at(1, 1) + at(-1, -1)) - 0.25 * (at(1, -1) + at(-1, 1))
    inv_det = 1.0 / (d_xx * d_yy - d_xy * d_xy)
    dst0 = -d_x * (inv_det * d_yy) + -d_y * (inv_det * -d_xy)
    dst1 = -d_x * (inv_det * -d_xy) + -d_y * (inv_det * d_xx)
    ok = (jnp.abs(dst0) <= 1.0) & (jnp.abs(dst1) <= 1.0) & valid
    return jnp.stack([dst0, dst1], axis=-1), ok
