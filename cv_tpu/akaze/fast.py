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
        from .extract import AkazeExtractor

        self._helper = AkazeExtractor(self.config)

    # -- jitted pipeline -----------------------------------------------------
    @partial(jax.jit, static_argnames=("self",))
    def extract(self, images: jnp.ndarray) -> FeatureSet:
        """``images``: (B, H, W) float32 in [0, 1] -> FeatureSet."""
        cfg = self.config
        b, h, w = images.shape
        specs = self._helper.specs(h, w)
        planes = build_scale_space(cfg, specs, images)

        # 1. Per-evolution top-K candidates.
        k = self.candidate_budget
        cand = []
        for p in planes:
            mask = extrema.candidate_mask(p.ldet, cfg.detector_threshold)
            flat = jnp.where(mask, p.ldet, -jnp.inf).reshape(b, -1)
            resp, idx = jax.lax.top_k(flat, k)  # (B, K)
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

        # 2. Exact sequential dedup as a device scan (vmapped over frames).
        # Candidates must be in (evolution-major, row-major pixel) order:
        # top_k returned response order, so re-sort each evolution by pixel
        # index (invalid slots pushed to the end).
        n_evo = len(cand)
        for c in cand:
            sort_key = jnp.where(c["valid"], c["idx"], jnp.iinfo(jnp.int32).max)
            order = jnp.argsort(sort_key, axis=1)
            for f in ("x", "y", "px", "py", "resp", "idx", "valid"):
                c[f] = jnp.take_along_axis(c[f], order, axis=1)

        ratios = [np.float32(2.0 ** c["spec"].octave) for c in cand]
        px_cmp = jnp.concatenate(
            [c["x"] * r for c, r in zip(cand, ratios)], axis=1
        )
        py_cmp = jnp.concatenate(
            [c["y"] * r for c, r in zip(cand, ratios)], axis=1
        )
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
        def conflicts_with(ca, cb, radius2):
            dx = ca["px"][:, :, None] - cb["px"][:, None, :]
            dy = ca["py"][:, :, None] - cb["py"][:, None, :]
            close = (dx * dx + dy * dy) <= radius2
            hit = close & cb["valid"][:, None, :] & ca["valid"][:, :, None]
            return jnp.any(hit, axis=-1)

        # Slack: the scan compares a mix of shifted/unshifted octave-0
        # coordinates; one side differs by at most 0.5*(ratio-1)*sqrt(2).
        max_ratio = max(2.0 ** c["spec"].octave for c in cand)
        slack = np.float32(0.5 * (max_ratio - 1.0) * np.sqrt(2.0) + 0.3)
        conflicted = [jnp.zeros_like(c["valid"]) for c in cand]
        for e in range(n_evo):
            c = cand[e]
            r_self = np.float32((c["size"] + slack) ** 2)
            dx = c["px"][:, :, None] - c["px"][:, None, :]
            dy = c["py"][:, :, None] - c["py"][:, None, :]
            close = (dx * dx + dy * dy) <= r_self
            close &= ~jnp.eye(k, dtype=bool)[None]  # self-distance never counts
            close &= c["valid"][:, None, :] & c["valid"][:, :, None]
            conflicted[e] |= jnp.any(close, axis=-1)
            if e + 1 < n_evo:
                hi = cand[e + 1]
                r_pair = np.float32((max(c["size"], hi["size"]) + slack) ** 2)
                lo_hit = conflicts_with(c, hi, r_pair)
                hi_hit = conflicts_with(hi, c, r_pair)
                conflicted[e] |= lo_hit
                conflicted[e + 1] |= hi_hit

        conf_all = jnp.concatenate(conflicted, axis=1) & valid_all
        c_total_slots = conf_all.shape[1]
        scan_cap = min(self.dedup_scan_cap, c_total_slots)
        # Stable compaction: conflicted candidates first, original order kept.
        comp_key = jnp.where(conf_all, 0, 1) * c_total_slots + jnp.arange(
            c_total_slots
        )
        comp_order = jnp.argsort(comp_key, axis=1)[:, :scan_cap]

        def takec(a):
            return jnp.take_along_axis(a, comp_order, axis=1)

        survive_scan = jax.vmap(extrema.dedup_scan_device)(
            takec(px_cmp),
            takec(py_cmp),
            takec(px_store),
            takec(py_store),
            takec(resp_all),
            takec(cls_all),
            takec(size2_all),
            takec(valid_all & conf_all),
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

        # 3. Flat plane buffers: one 1-D buffer per plane type spanning all
        # evolutions, so every downstream sample is ONE 1-D gather with
        # per-keypoint base offsets (the fastest gather form on TPU).
        sizes_px = [s.height * s.width for s in specs]
        bases = np.concatenate([[0], np.cumsum(sizes_px)[:-1]]).astype(np.int32)
        flat_ldet = jnp.concatenate([p.ldet.reshape(b, -1) for p in planes], axis=1)
        # Packed (Lt, Lx, Ly) buffer: descriptor/orientation sampling fetches
        # all three planes with ONE index-bound gather (trailing 3-slice).
        flat_pack = jnp.concatenate(
            [
                jnp.stack(
                    [p.lt.reshape(b, -1), p.lx.reshape(b, -1), p.ly.reshape(b, -1)],
                    axis=-1,
                )
                for p in planes
            ],
            axis=1,
        )

        # Static per-slot tables over the concatenated candidate axis (C,).
        c_total = n_evo * k
        slot_cls = np.repeat(np.arange(n_evo), k).astype(np.int32)
        t_width = np.array([s.width for s in specs], np.int32)
        t_height = np.array([s.height for s in specs], np.int32)
        t_base = bases
        t_power = np.array([2.0**s.octave for s in specs], np.float32)
        t_octave = np.array([s.octave for s in specs], np.int32)
        t_size2x = np.array(
            [
                np.float32(np.float32(s.esigma) * np.float32(cfg.derivative_factor))
                * np.float32(2.0)
                for s in specs
            ],
            np.float32,
        )
        t_ssamp = np.array(
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
        )

        x_all = jnp.concatenate([c["x"] for c in cand], axis=1).astype(jnp.int32)
        y_all = jnp.concatenate([c["y"] for c in cand], axis=1).astype(jnp.int32)
        # (valid_all/resp_all updated by the dedup above.)
        resp_ok = jnp.where(
            jnp.concatenate([c["valid"] for c in cand], axis=1),
            jnp.concatenate([c["resp"] for c in cand], axis=1),
            -jnp.inf,
        )

        # 4. Subpixel refinement for every surviving slot (9 flat gathers).
        sw = jnp.asarray(t_width)[slot_cls][None, :]
        sh = jnp.asarray(t_height)[slot_cls][None, :]
        sb = jnp.asarray(t_base)[slot_cls][None, :]
        xs = jnp.clip(x_all, 1, sw - 2)
        ys = jnp.clip(y_all, 1, sh - 2)
        center = sb + ys * sw + xs

        def at(dx, dy):
            return jnp.take_along_axis(flat_ldet, center + dy * sw + dx, axis=1)

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
        resp_ok = jnp.where(refine_ok, resp_ok, -jnp.inf)
        pw = jnp.asarray(t_power)[slot_cls][None, :]
        px = (xs.astype(jnp.float32) + dst0) * pw + 0.5 * (pw - 1.0)
        py = (ys.astype(jnp.float32) + dst1) * pw + 0.5 * (pw - 1.0)

        # 5. Global top-M by response; compact every field to (B, M).
        m = min(self.max_features, c_total)
        top_resp, top_idx = jax.lax.top_k(resp_ok, m)  # (B, M)

        def take(a):
            return jnp.take_along_axis(a, top_idx, axis=1)

        sel_cls = jnp.asarray(slot_cls)[top_idx]  # (B, M)
        sel_base = jnp.asarray(t_base)[sel_cls]
        sel_w = jnp.asarray(t_width)[sel_cls]
        sel_h = jnp.asarray(t_height)[sel_cls]
        sel_pw = jnp.asarray(t_power)[sel_cls]
        sel_size = jnp.asarray(t_size2x)[sel_cls]
        sel_ssamp = jnp.asarray(t_ssamp)[sel_cls]
        sel_oct = jnp.asarray(t_octave)[sel_cls]
        sel_px = take(px)
        sel_py = take(py)
        sel_valid = jnp.isfinite(top_resp)
        xf = sel_px / sel_pw
        yf = sel_py / sel_pw

        # 6. Orientation then M-LDB, flat-addressed, vmapped over frames.
        angle = jax.vmap(desc.orientation_flat)(
            flat_pack, sel_base, sel_w, sel_h, xf, yf, sel_ssamp
        )
        if self.sampler == "onehot":
            # Gather-free sampling: padded plane stack + factorized one-hot
            # MXU selection (bitwise-equal to the gather path, ~1.7x faster
            # on TPU; see descriptors.mldb_flat_onehot).
            hp = max(128, h)
            wp = max(128, w)
            planes_padded = jnp.zeros((b, n_evo, hp, wp, 3), jnp.float32)
            for e, p in enumerate(planes):
                planes_padded = planes_padded.at[
                    :, e, : p.lt.shape[-2], : p.lt.shape[-1], :
                ].set(jnp.stack([p.lt, p.lx, p.ly], axis=-1))
            planes_padded = planes_padded.reshape(b * n_evo, hp, wp, 3)
            lvl = (
                jnp.arange(b, dtype=jnp.int32)[:, None] * n_evo + sel_cls
            ).reshape(-1)
            words, w_ok = desc.mldb_flat_onehot(
                planes_padded,
                lvl,
                sel_w.reshape(-1),
                sel_h.reshape(-1),
                xf.reshape(-1),
                yf.reshape(-1),
                sel_ssamp.reshape(-1),
                angle.reshape(-1),
                pattern_size=cfg.descriptor_pattern_size,
            )
            words = words.reshape(b, m, -1)
            w_ok = w_ok.reshape(b, m)
        else:
            words, w_ok = jax.vmap(
                partial(desc.mldb_flat, pattern_size=cfg.descriptor_pattern_size)
            )(
                flat_pack,
                sel_base,
                sel_w,
                sel_h,
                xf,
                yf,
                sel_ssamp,
                angle,
            )

        return FeatureSet(
            point=jnp.stack([sel_px, sel_py], axis=-1),
            response=top_resp,
            size=sel_size,
            angle=angle,
            octave=sel_oct,
            class_id=sel_cls,
            words=words,
            valid=sel_valid & w_ok,
        )
