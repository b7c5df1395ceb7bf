"""Trained bag-of-features codebook for loop-closure LSH sketches.

The reference seeds its ``HammingHasher`` with 4,096 *trained* codewords
shipped as static data (cv-sfm/src/lib.rs:210-220, codewords.rs:4-4103 —
private training data of the external hamming-lsh crate).  cv_tpu's sketch
is a 512-bit bag-of-words occupancy vector (matching/lsh.py), so its
codebook has exactly 512 entries — one per sketch bit; training those 512
centers on real descriptor statistics carries the same information the
reference buys with 4,096 aliased codewords, and measurably beats the
seeded-random fallback on near-duplicate recall (tests/test_sfm.py).

Training is plain NumPy k-means in Hamming space (k-means++ seeding,
per-bit majority-vote centroid updates, empty clusters reseeded from the
farthest descriptors).  It is an offline tool — the trained table ships as
``codebook.npy`` package data and is loaded by ``lsh.codewords()``.
"""

from __future__ import annotations

import os

from cv_tpu.utils.fixtures import fixture_path

import numpy as np

from .hamming import DESCRIPTOR_BITS, DESCRIPTOR_WORDS

CODEBOOK_PATH = os.path.join(os.path.dirname(__file__), "codebook.npy")


def unpack(words: np.ndarray) -> np.ndarray:
    """(N, 16) uint32 -> (N, 486) uint8 of {0,1}, little-endian bit order."""
    words = np.ascontiguousarray(words, np.uint32)
    bits = np.unpackbits(
        words.view(np.uint8).reshape(len(words), -1), axis=1, bitorder="little"
    )
    return bits[:, :DESCRIPTOR_BITS]


def pack(bits: np.ndarray) -> np.ndarray:
    """(N, 486) {0,1} -> (N, 16) uint32 (padding bits past 486 zero)."""
    n = len(bits)
    padded = np.zeros((n, DESCRIPTOR_WORDS * 32), np.uint8)
    padded[:, :DESCRIPTOR_BITS] = bits
    by = np.packbits(padded, axis=1, bitorder="little")
    return by.view("<u4").astype(np.uint32)


def _hamming_table(a_bits: np.ndarray, b_bits: np.ndarray) -> np.ndarray:
    """(N, 486) x (M, 486) {0,1} -> (N, M) int32 Hamming distances.

    popcount(a ^ b) = w(a) + w(b) - 2 a.b — one int matmul, the same
    identity matching/hamming.py uses on the MXU.
    """
    a = a_bits.astype(np.int32)
    b = b_bits.astype(np.int32)
    dots = a @ b.T
    return a.sum(1)[:, None] + b.sum(1)[None, :] - 2 * dots


def train_codebook(
    descriptors: np.ndarray,
    n_codewords: int = 512,
    iters: int = 25,
    seed: int = 0,
) -> np.ndarray:
    """Hamming k-means over packed descriptors.

    ``descriptors``: (N, 16) uint32 packed 486-bit M-LDB words.
    Returns (n_codewords, 16) uint32 packed centroids, deterministic in
    ``seed``.
    """
    rng = np.random.default_rng(seed)
    bits = unpack(np.unique(descriptors, axis=0))
    n = len(bits)
    if n < n_codewords:
        raise ValueError(f"need >= {n_codewords} distinct descriptors, got {n}")

    # k-means++ seeding in Hamming space: each next seed drawn with
    # probability proportional to distance-to-nearest-seed.
    centers = np.empty((n_codewords, DESCRIPTOR_BITS), np.uint8)
    centers[0] = bits[rng.integers(n)]
    d_near = _hamming_table(bits, centers[:1])[:, 0]
    for i in range(1, n_codewords):
        p = d_near.astype(np.float64)
        total = p.sum()
        if total <= 0:
            centers[i:] = bits[rng.choice(n, n_codewords - i, replace=False)]
            break
        centers[i] = bits[rng.choice(n, p=p / total)]
        d_near = np.minimum(d_near, _hamming_table(bits, centers[i : i + 1])[:, 0])

    assign = None
    for _ in range(iters):
        d = _hamming_table(bits, centers)
        new_assign = d.argmin(axis=1)
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        d_own = d[np.arange(n), assign]
        counts = np.bincount(assign, minlength=n_codewords)
        # Per-bit majority vote within each cluster (ties -> 1, matching
        # the >= rounding of mean >= 0.5).
        sums = np.zeros((n_codewords, DESCRIPTOR_BITS), np.int64)
        np.add.at(sums, assign, bits.astype(np.int64))
        nonempty = counts > 0
        centers[nonempty] = (
            2 * sums[nonempty] >= counts[nonempty, None]
        ).astype(np.uint8)
        # Reseed empty clusters from the descriptors farthest from their
        # centers (the standard farthest-point repair).
        empty = np.nonzero(~nonempty)[0]
        if len(empty):
            far = np.argsort(d_own)[::-1][: len(empty)]
            centers[empty] = bits[far]
    return pack(centers)


def training_descriptors(max_per_frame: int = 4096) -> np.ndarray:
    """Extract the training set: the KITTI pair plus rendered star-field
    sequences at the default (dense) threshold.  Offline-only; runs the
    standard extractor on whatever platform JAX selected."""
    import jax.numpy as jnp

    from cv_tpu.akaze import Akaze, AkazeExtractor, load_gray
    from cv_tpu.akaze.extract import to_gray_f32
    from cv_tpu.apps.synth import render_sequence

    ex = AkazeExtractor(Akaze(maximum_features=max_per_frame))
    frames = [
        to_gray_f32(load_gray(fixture_path("0000000000.png"))),
        to_gray_f32(load_gray(fixture_path("0000000014.png"))),
    ]
    for seed in (0, 1, 2):
        images, _, _ = render_sequence(
            n_frames=8, height=512, width=640, n_points=900, seed=seed
        )
        frames.extend(to_gray_f32(img) for img in images[::2])
    words = []
    for img in frames:
        _, w = ex.extract(jnp.asarray(img))
        words.append(np.asarray(w, np.uint32))
    return np.concatenate(words, axis=0)


def main():
    """Train and write the package codebook (offline tool)."""
    desc = training_descriptors()
    print(f"training on {len(desc)} descriptors")
    cb = train_codebook(desc)
    np.save(CODEBOOK_PATH, cb)
    print(f"wrote {CODEBOOK_PATH}: {cb.shape} {cb.dtype}")


if __name__ == "__main__":
    main()
