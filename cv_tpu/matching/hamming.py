"""Bit-packed Hamming descriptor matching on the MXU.

TPU-native replacement for the reference's per-pair Hamming loops
(``space::LinearKnn`` in akaze/tests/estimate_pose.rs:78-97) and per-frame
HGG approximate-NN maps (cv-sfm/src/lib.rs:75, 3097-3133).  At the <= 8192
descriptors/frame the engine caps at, a dense (N, M) distance table computed
as a bit-packed popcount "matmul" saturates the MXU and is faster than any
graph index — the HGG exists only because CPUs are slow at this.

Two equivalent kernels:
* ``distance_matrix`` — XOR + population_count over (N, M, 16) uint32 (VPU)
* ``distance_matrix_mxu`` — popcount(xor) = w_a + w_b - 2 a.b over unpacked
  {0,1} int8 bit tensors, which XLA lowers to one int8 MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_BITS = 486
DESCRIPTOR_WORDS = 16
# Distance sentinel for masked/padded rows: any value > DESCRIPTOR_BITS
# (the maximum possible Hamming distance) can never win a nearest-neighbor
# comparison or pass a margin test against a real distance.
PAD_DISTANCE = 10_000


def distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distances of packed descriptors.

    ``a``: (N, W) uint32, ``b``: (M, W) uint32 -> (N, M) int32.

    Evaluated as a static sum of (N, M) per-word XOR+popcount terms rather
    than one (N, M, W) tensor: W=16 on the TPU lane axis tile-pads 16 ->
    128 (8x the traffic and relayouts on every op); the per-word form
    keeps every intermediate (N, M)-tiled and XLA fuses the 16 terms into
    one pass.  Identical integer results.
    """
    acc = None
    for w in range(a.shape[-1]):
        x = a[:, None, w] ^ b[None, :, w]
        t = jax.lax.population_count(x).astype(jnp.int32)
        acc = t if acc is None else acc + t
    return acc


def unpack_bits(words: jnp.ndarray, n_bits: int = DESCRIPTOR_BITS) -> jnp.ndarray:
    """(N, W) uint32 -> (N, n_bits) int8 of {0,1} (little-endian bit order)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(words.shape[0], -1)[:, :n_bits]
    return bits.astype(jnp.int8)


def distance_matrix_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamming distances via one int8 MXU matmul.

    popcount(a ^ b) = w(a) + w(b) - 2 a.b for {0,1} bit vectors.
    """
    ab = unpack_bits(a)
    bb = unpack_bits(b)
    dots = jax.lax.dot_general(
        ab,
        bb,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    wa = jnp.sum(ab.astype(jnp.int32), axis=-1)
    wb = jnp.sum(bb.astype(jnp.int32), axis=-1)
    return wa[:, None] + wb[None, :] - 2 * dots


def knn2(dist: jnp.ndarray):
    """Two nearest neighbors per row: (indices (N, 2), distances (N, 2)).

    Ties resolve to the lower index, matching a linear scan that replaces
    only on strict improvement.
    """
    neg, idx = jax.lax.top_k(-dist, 2)
    return idx, -neg


def lowes_ratio_matches(
    a_words: jnp.ndarray, b_words: jnp.ndarray, ratio: float = 0.5
):
    """Brute-force 2-NN + Lowes ratio test (estimate_pose.rs:78-97).

    Returns ``(b_index (N,), keep (N,) bool)``: for each descriptor in ``a``,
    its best match in ``b`` and whether ``d0 < d1 * ratio`` (computed in f32,
    matching the reference).
    """
    dist = distance_matrix(a_words, b_words)
    idx, d = knn2(dist)
    keep = d[:, 0].astype(jnp.float32) < d[:, 1].astype(jnp.float32) * jnp.float32(
        ratio
    )
    return idx[:, 0], keep


def _best2_margin(dist: jnp.ndarray, better_by: int):
    """Best match per row iff best + better_by <= second-best
    (cv-sfm/src/lib.rs:3097-3114)."""
    idx, d = knn2(dist)
    ok = d[:, 0] + better_by <= d[:, 1]
    return idx[:, 0], ok


def symmetric_matches(
    a_words: jnp.ndarray,
    b_words: jnp.ndarray,
    better_by: int = 24,
    n_valid_a=None,
    n_valid_b=None,
):
    """Mutual-best matching with distance margin (cv-sfm/src/lib.rs:3116-3133).

    Returns ``(b_index (N,), keep (N,) bool)`` where ``keep[i]`` means feature
    ``i`` of ``a`` and ``b_index[i]`` of ``b`` are each other's best match and
    both margins hold.

    ``n_valid_a``/``n_valid_b``: optional traced counts when the word arrays
    are bucket-padded (padding rows can never match: their distances are set
    to a sentinel far above the 486-bit maximum).  Padding to power-of-two
    buckets keeps one compiled program per bucket pair instead of one per
    exact frame size.
    """
    dist = distance_matrix(a_words, b_words)
    if n_valid_a is not None:
        va = jnp.arange(a_words.shape[0]) < n_valid_a
        vb = jnp.arange(b_words.shape[0]) < n_valid_b
        dist = jnp.where(va[:, None] & vb[None, :], dist, PAD_DISTANCE)
    fwd_idx, fwd_ok = _best2_margin(dist, better_by)
    rev_idx, rev_ok = _best2_margin(dist.T, better_by)
    mutual = rev_idx[fwd_idx] == jnp.arange(a_words.shape[0])
    keep = fwd_ok & rev_ok[fwd_idx] & mutual
    return fwd_idx, keep


def match_descriptors(a_words: np.ndarray, b_words: np.ndarray, ratio: float = 0.5):
    """Host convenience: returns (ix_a, ix_b) arrays of Lowes-ratio matches."""
    idx, keep = jax.jit(lowes_ratio_matches, static_argnames=("ratio",))(
        jnp.asarray(a_words), jnp.asarray(b_words), ratio=ratio
    )
    keep = np.asarray(keep)
    ix_a = np.nonzero(keep)[0]
    return ix_a, np.asarray(idx)[ix_a]
