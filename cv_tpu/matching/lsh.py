"""Frame-level bag-of-features LSH for loop-closure retrieval.

The reference stores a ``HammingHasher<64, 512>`` seeded with 4096 static
codewords (cv-sfm/src/lib.rs:205-220, codewords.rs) and indexes frame
sketches in an HGG graph for approximate search.  The TPU-native design keeps
the same contract — descriptors in, 512-bit frame sketch out, Hamming
retrieval over sketches — but as dense device math:

* 512 trained binary codewords (Hamming k-means over KITTI + rendered
  star-field descriptors; see matching/codebook.py — the reference's own
  trained codewords are private data of the external hamming-lsh crate),
  falling back to seeded-PRNG codewords when the trained table is absent
* sketch bit i records whether some frame descriptor lies unusually close
  to codeword i: the per-codeword min-distance profile binarized at its own
  0.4-quantile (one bit-packed popcount matmul + a 512-element sort).  The
  earlier nearest-codeword occupancy bag saturates (~86% bits set at 1024
  descriptors/frame) and measured recall@1 0.30-0.60 on near-duplicate
  retrieval; the quantile-normalized profile always sets ~205 bits and
  measured 1.00/1.00 recall@1/@2 with the trained codebook
  (experiments/exp_sketch_recall.py, tests/test_lsh_recall.py)
* frame retrieval is a brute-force Hamming scan over all sketches — at the
  frame counts an incremental SfM session reaches, a dense scan on the MXU
  beats any graph index.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import DESCRIPTOR_WORDS, distance_matrix

SKETCH_BITS = 512
SKETCH_WORDS = SKETCH_BITS // 32


@lru_cache(maxsize=None)
def codewords() -> np.ndarray:
    """(512, 16) uint32 binary codewords: the trained codebook when the
    package data file exists, else the deterministic seeded fallback."""
    from .codebook import CODEBOOK_PATH

    if os.path.exists(CODEBOOK_PATH):
        cw = np.load(CODEBOOK_PATH).astype(np.uint32)
        assert cw.shape == (SKETCH_BITS, DESCRIPTOR_WORDS), cw.shape
        return cw
    return random_codewords()


@lru_cache(maxsize=None)
def random_codewords() -> np.ndarray:
    """(512, 16) uint32 deterministic seeded-PRNG codewords (fallback and
    the recall baseline the trained codebook is measured against)."""
    rng = np.random.default_rng(0x5F3C)
    words = rng.integers(0, 2**32, size=(SKETCH_BITS, DESCRIPTOR_WORDS), dtype=np.uint64)
    words = words.astype(np.uint32)
    # Zero the 26 padding bits past 486 so codewords live in descriptor space.
    words[:, -1] &= np.uint32((1 << (486 - 15 * 32)) - 1)
    return words


# Bits set in a sketch: the 0.4 quantile of 512 keeps ~205 active bits per
# frame regardless of descriptor count (measured recall optimum; see module
# docstring).
QUANTILE_INDEX = 204


def hash_bag(words: jnp.ndarray, cw: jnp.ndarray | None = None) -> jnp.ndarray:
    """Hash a frame's descriptors (N, 16) uint32 into a (16,) uint32 sketch.

    Bit i of the sketch is set when the frame's closest descriptor to
    codeword i is within the profile's own 0.4-quantile distance.  ``cw``
    overrides the package codeword table (used by the recall tests to
    compare codebooks).
    """
    return _hash_bag(words, codewords() if cw is None else cw)


@jax.jit
def _hash_bag(words: jnp.ndarray, cw: jnp.ndarray) -> jnp.ndarray:
    d = distance_matrix(words, jnp.asarray(cw))  # (N, 512)
    return sketch_from_distances(d)


def sketch_from_distances(
    d: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(N, 512) descriptor-to-codeword distances -> (16,) uint32 sketch.

    ``valid`` masks padded descriptor rows (the fused extractor path).
    Shared by the host ``hash_bag`` and the extractor's fused program so
    both produce identical sketches.
    """
    if valid is not None:
        d = jnp.where(valid[:, None], d, jnp.int32(1 << 30))
    prof = jnp.min(d, axis=0)  # (512,) min distance per codeword
    t = jnp.sort(prof)[QUANTILE_INDEX]
    bits = (prof <= t).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(
        bits.reshape(SKETCH_WORDS, 32) << shifts[None, :],
        axis=-1,
        dtype=jnp.uint32,
    )


def sketch_distances(query: jnp.ndarray, sketches: jnp.ndarray) -> jnp.ndarray:
    """Hamming distances between one sketch (16,) and many (M, 16)."""
    x = query[None, :] ^ sketches
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint16)


def descriptor_rerank_score(
    query_words: np.ndarray, cand_words: np.ndarray, sub: int = 64
) -> float:
    """Descriptor-level frame-similarity score for reranking sketch
    candidates (lower = more similar).

    Mean over the query's strongest ``sub`` descriptors of the min Hamming
    distance to the candidate's strongest ``sub`` (frames store descriptors
    response-sorted).  The 512-bit sketch is a lossy bag — its top
    candidates are reranked with this exact-descriptor score, which the
    recall oracle (experiments/exp_sketch_recall.py) measured at recall@1
    1.00 where the raw sketch ordering reaches 0.80.  Host NumPy: the
    operands are a few KB and the retrieval path is dispatch-latency-bound.
    """
    q = np.ascontiguousarray(query_words[:sub], np.uint32)
    c = np.ascontiguousarray(cand_words[:sub], np.uint32)
    if len(q) == 0 or len(c) == 0:
        return float("inf")
    x = (q[:, None, :] ^ c[None, :, :]).view(np.uint8)
    d = _POPCOUNT8[x].sum(axis=2, dtype=np.int32)  # (|q|, |c|)
    return float(d.min(axis=1).mean())
