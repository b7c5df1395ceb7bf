"""End-to-end AKAZE feature extraction.

Orchestrates the device pipeline (scale space -> detector response ->
candidate masks -> subpixel/orientation -> M-LDB) with the host-side exact
dedup, mirroring ``Akaze::extract`` (/root/reference/akaze/src/lib.rs:295-339):

    scale space -> detector response -> extrema -> dedup -> subpixel +
    orientation -> sort by response desc -> truncate -> descriptors

Keypoints are returned as a dict of arrays (structure-of-arrays form of the
reference's ``Vec<KeyPoint>``), descriptors as ``(N, 16) uint32`` bit-packed
486-bit M-LDB words (the reference's ``BitArray<64>`` little-endian).
"""

from __future__ import annotations

import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import descriptors as desc
from . import extrema
from .config import Akaze, allocate_evolutions
from .scale_space import build_scale_space

log = logging.getLogger("cv_tpu.akaze")

DESCRIPTOR_WORDS = 16
DESCRIPTOR_BITS = 486


def _next_bucket(n: int, minimum: int = 128) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class AkazeExtractor:
    """Stateful extractor: caches jitted programs per image shape."""

    def __init__(self, config: Akaze | None = None):
        self.config = config or Akaze()
        self._specs_cache: dict[tuple[int, int], list] = {}

    # -- static layout -------------------------------------------------------
    def specs(self, height: int, width: int):
        key = (height, width)
        if key not in self._specs_cache:
            self._specs_cache[key] = allocate_evolutions(self.config, width, height)
        return self._specs_cache[key]

    # -- device programs -----------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "height", "width"))
    def _scale_space_program(self, image, height, width):
        specs = self.specs(height, width)
        planes = build_scale_space(self.config, specs, image)
        masks = [
            extrema.candidate_mask(p.ldet, self.config.detector_threshold)
            for p in planes
        ]
        return (
            [p.lt for p in planes],
            [p.lx for p in planes],
            [p.ly for p in planes],
            [p.ldet for p in planes],
            masks,
        )

    @partial(jax.jit, static_argnames=("self", "power"))
    def _refine_orient_program(self, ldet, lx, ly, sub, ixy, valid, s, power):
        """Subpixel refinement + orientation for one octave group."""
        delta, ok = extrema.subpixel_refine_batch(
            ldet, jnp.concatenate([sub[:, None], ixy], axis=1), valid
        )
        p = jnp.float32(power)
        x = ixy[:, 0].astype(jnp.float32) + delta[:, 0]
        y = ixy[:, 1].astype(jnp.float32) + delta[:, 1]
        point = jnp.stack(
            [x * p + 0.5 * (p - 1.0), y * p + 0.5 * (p - 1.0)], axis=-1
        )
        xf = point[:, 0] / p
        yf = point[:, 1] / p
        angle = desc.compute_orientations(lx, ly, sub, xf, yf, s)
        return point, angle, ok

    @partial(jax.jit, static_argnames=("self", "power"))
    def _mldb_program(self, lt, lx, ly, sub, point, s, angle, power):
        p = jnp.float32(power)
        words, ok = desc.compute_mldb_descriptors(
            lt,
            lx,
            ly,
            sub,
            point[:, 0] / p,
            point[:, 1] / p,
            s,
            angle,
            self.config.descriptor_pattern_size,
        )
        return words, ok

    # -- host orchestration ----------------------------------------------------
    def extract(self, image: np.ndarray):
        """Extract keypoints + descriptors from one grayscale image.

        ``image``: (H, W) uint8/uint16/float. Returns ``(keypoints, words)``
        where keypoints is a dict of arrays and words is (N, 16) uint32.
        """
        img = to_gray_f32(image)
        h, w = img.shape
        specs = self.specs(h, w)

        # Coarse phase timing at info level, like the reference's Instant
        # logs around each pipeline stage (akaze/src/lib.rs:269-336).
        t0 = time.perf_counter()
        lts, lxs, lys, ldets, masks = self._scale_space_program(
            jnp.asarray(img), h, w
        )
        cands = extrema.extract_candidates(specs, masks, ldets)
        t1 = time.perf_counter()
        log.info("AKAZE scale space + detector: %.1f ms", (t1 - t0) * 1e3)
        kps = extrema.dedup_keypoints_exact(cands, self.config.derivative_factor)
        t2 = time.perf_counter()
        log.info(
            "AKAZE extrema dedup: %.1f ms (%d keypoints)",
            (t2 - t1) * 1e3,
            len(kps["response"]),
        )

        n = len(kps["response"])
        if n == 0:
            return _empty_keypoints(), np.zeros((0, DESCRIPTOR_WORDS), np.uint32)

        # Group by octave; each group has homogeneous plane shapes.
        octaves = sorted(set(int(o) for o in kps["octave"]))
        base_eid = {}
        for s in specs:
            base_eid.setdefault(s.octave, s.index)

        refined = {
            "point": np.zeros((n, 2), np.float32),
            "angle": np.zeros(n, np.float32),
            "ok": np.zeros(n, bool),
        }
        group_data = {}
        for oct_i in octaves:
            sel = np.nonzero(kps["octave"] == oct_i)[0]
            k = len(sel)
            kb = _next_bucket(k)
            sub = (kps["class_id"][sel] - base_eid[oct_i]).astype(np.int32)
            ixy = kps["ixy"][sel].astype(np.int32)
            size = kps["size"][sel]  # pre-doubling
            ratio = np.float32(2.0**oct_i)
            s_samp = np.round(size / ratio).astype(np.float32)  # == round(0.5*2size/r)
            e_sel = [s.index for s in specs if s.octave == oct_i]
            ldet = jnp.stack([ldets[e] for e in e_sel])
            lx = jnp.stack([lxs[e] for e in e_sel])
            ly = jnp.stack([lys[e] for e in e_sel])
            lt = jnp.stack([lts[e] for e in e_sel])
            group_data[oct_i] = (lt, lx, ly, e_sel)

            pad = kb - k
            point, angle, ok = self._refine_orient_program(
                ldet,
                lx,
                ly,
                jnp.asarray(np.pad(sub, (0, pad))),
                jnp.asarray(np.pad(ixy, ((0, pad), (0, 0)), constant_values=1)),
                jnp.asarray(np.pad(np.ones(k, bool), (0, pad))),
                jnp.asarray(np.pad(s_samp, (0, pad), constant_values=1.0)),
                float(2.0**oct_i),
            )
            refined["point"][sel] = np.asarray(point)[:k]
            refined["angle"][sel] = np.asarray(angle)[:k]
            refined["ok"][sel] = np.asarray(ok)[:k]

        keep = refined["ok"]
        kp = {
            "point": refined["point"][keep],
            "angle": refined["angle"][keep],
            "response": kps["response"][keep],
            "size": (kps["size"][keep] * np.float32(2.0)),  # doubled (":345")
            "octave": kps["octave"][keep],
            "class_id": kps["class_id"][keep],
        }

        # Sort by response descending, truncate (lib.rs:326-327).
        order = np.argsort(-kp["response"], kind="stable")
        order = order[: self.config.maximum_features]
        kp = {k_: v[order] for k_, v in kp.items()}

        t3 = time.perf_counter()
        log.info("AKAZE refine + orientation: %.1f ms", (t3 - t2) * 1e3)
        # M-LDB descriptors; out-of-bounds samples drop the keypoint.
        m = len(kp["response"])
        words_out = np.zeros((m, DESCRIPTOR_WORDS), np.uint32)
        ok_out = np.zeros(m, bool)
        for oct_i in octaves:
            sel = np.nonzero(kp["octave"] == oct_i)[0]
            if len(sel) == 0:
                continue
            k = len(sel)
            kb = _next_bucket(k)
            pad = kb - k
            lt, lx, ly, e_sel = group_data[oct_i]
            sub = (kp["class_id"][sel] - base_eid[oct_i]).astype(np.int32)
            ratio = np.float32(2.0**oct_i)
            s_samp = np.round(
                np.float32(0.5) * kp["size"][sel] / ratio
            ).astype(np.float32)
            words, ok = self._mldb_program(
                lt,
                lx,
                ly,
                jnp.asarray(np.pad(sub, (0, pad))),
                jnp.asarray(
                    np.pad(kp["point"][sel], ((0, pad), (0, 0)), constant_values=50.0)
                ),
                jnp.asarray(np.pad(s_samp, (0, pad), constant_values=1.0)),
                jnp.asarray(np.pad(kp["angle"][sel], (0, pad))),
                float(2.0**oct_i),
            )
            words_out[sel] = np.asarray(words)[:k]
            ok_out[sel] = np.asarray(ok)[:k]

        kp = {k_: v[ok_out] for k_, v in kp.items()}
        log.info(
            "AKAZE descriptors: %.1f ms (%d features)",
            (time.perf_counter() - t3) * 1e3,
            int(ok_out.sum()),
        )
        return kp, words_out[ok_out]


def to_gray_f32(image: np.ndarray) -> np.ndarray:
    """Pixel-value normalization matching ``GrayFloatImage::from_dynamic``
    (image.rs:45-109): u8 -> /255, u16 -> /65535, float passthrough."""
    if image.ndim == 3:
        # Rec.709 luma, as the image crate's grayscale() uses.
        image = (
            0.2126 * image[..., 0] + 0.7152 * image[..., 1] + 0.0722 * image[..., 2]
        ).astype(image.dtype)
    if image.dtype == np.uint8:
        return (image.astype(np.float32)) / np.float32(255.0)
    if image.dtype == np.uint16:
        return (image.astype(np.float32)) / np.float32(65535.0)
    return image.astype(np.float32)


def _empty_keypoints():
    return {
        "point": np.zeros((0, 2), np.float32),
        "angle": np.zeros(0, np.float32),
        "response": np.zeros(0, np.float32),
        "size": np.zeros(0, np.float32),
        "octave": np.zeros(0, np.int64),
        "class_id": np.zeros(0, np.int64),
    }


def load_gray(path) -> np.ndarray:
    """Load an image file as grayscale uint8/uint16 array."""
    from PIL import Image

    im = Image.open(path)
    if im.mode not in ("L", "I;16"):
        im = im.convert("L")
    return np.asarray(im)
