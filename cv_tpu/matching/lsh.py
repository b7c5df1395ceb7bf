"""Frame-level bag-of-features LSH for loop-closure retrieval.

The reference stores a ``HammingHasher<64, 512>`` seeded with 4096 static
codewords (cv-sfm/src/lib.rs:205-220, codewords.rs) and indexes frame
sketches in an HGG graph for approximate search.  The TPU-native design keeps
the same contract — descriptors in, 512-bit frame sketch out, Hamming
retrieval over sketches — but as dense device math:

* 512 deterministic binary codewords (seeded PRNG; the reference's trained
  codewords are private data of the external hamming-lsh crate)
* each descriptor votes for its nearest codeword (one bit-packed popcount
  matmul); the sketch is the OR of votes
* frame retrieval is a brute-force Hamming scan over all sketches — at the
  frame counts an incremental SfM session reaches, a dense scan on the MXU
  beats any graph index.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import DESCRIPTOR_WORDS, distance_matrix

SKETCH_BITS = 512
SKETCH_WORDS = SKETCH_BITS // 32


@lru_cache(maxsize=None)
def codewords() -> np.ndarray:
    """(512, 16) uint32 deterministic binary codewords."""
    rng = np.random.default_rng(0x5F3C)
    words = rng.integers(0, 2**32, size=(SKETCH_BITS, DESCRIPTOR_WORDS), dtype=np.uint64)
    words = words.astype(np.uint32)
    # Zero the 26 padding bits past 486 so codewords live in descriptor space.
    words[:, -1] &= np.uint32((1 << (486 - 15 * 32)) - 1)
    return words


@jax.jit
def hash_bag(words: jnp.ndarray) -> jnp.ndarray:
    """Hash a frame's descriptors (N, 16) uint32 into a (16,) uint32 sketch.

    Bit i of the sketch is set when some descriptor's nearest codeword is i.
    """
    cw = jnp.asarray(codewords())
    d = distance_matrix(words, cw)  # (N, 512)
    nearest = jnp.argmin(d, axis=-1)  # (N,)
    votes = jnp.zeros((SKETCH_BITS,), jnp.uint32).at[nearest].set(1)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = votes.reshape(SKETCH_WORDS, 32)
    return jnp.sum(bits << shifts[None, :], axis=-1, dtype=jnp.uint32)


def sketch_distances(query: jnp.ndarray, sketches: jnp.ndarray) -> jnp.ndarray:
    """Hamming distances between one sketch (16,) and many (M, 16)."""
    x = query[None, :] ^ sketches
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
