"""Sketch design shoot-out for loop-closure recall: occupancy bag vs
median-thresholded codeword-distance profile, random vs trained codewords.
Caches extracted descriptors in /tmp to iterate cheaply."""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

CACHE = "/tmp/sketch_recall_words.npz"
N_SCENES, Q_FRAME = 10, 4


def get_words():
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return [(z[f"db{i}"], z[f"q{i}"]) for i in range(N_SCENES)]
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cv_tpu.akaze import Akaze, AkazeExtractor
    from cv_tpu.akaze.extract import to_gray_f32
    from cv_tpu.apps.synth import render_sequence

    ex = AkazeExtractor(Akaze(maximum_features=1024))
    rng = np.random.default_rng(7)
    out = {}
    pairs = []
    for i, seed in enumerate(range(100, 100 + N_SCENES)):
        images, _, _ = render_sequence(
            n_frames=Q_FRAME + 1, height=384, width=512, n_points=700, seed=seed
        )
        db = to_gray_f32(images[0])
        q = to_gray_f32(images[Q_FRAME])
        q = np.clip(q + rng.normal(0, 0.01, q.shape).astype(np.float32), 0, 1)
        _, wdb = ex.extract(jnp.asarray(db))
        _, wq = ex.extract(jnp.asarray(q))
        out[f"db{i}"] = np.asarray(wdb, np.uint32)
        out[f"q{i}"] = np.asarray(wq, np.uint32)
        pairs.append((out[f"db{i}"], out[f"q{i}"]))
    np.savez(CACHE, **out)
    return pairs


def unpack(words):
    from cv_tpu.matching.codebook import unpack as u

    return u(words)


def ham_table(a_bits, b_bits):
    a = a_bits.astype(np.int32)
    b = b_bits.astype(np.int32)
    return a.sum(1)[:, None] + b.sum(1)[None, :] - 2 * (a @ b.T)


def sketch_occupancy(words, cw_bits):
    d = ham_table(unpack(words), cw_bits)
    near = d.argmin(1)
    s = np.zeros(512, bool)
    s[near] = True
    return s


def sketch_profile(words, cw_bits):
    d = ham_table(unpack(words), cw_bits)  # (N, 512)
    prof = d.mean(0)
    return prof <= np.median(prof)


def recall(pairs, cw_bits, sk):
    db = np.stack([sk(w, cw_bits) for w, _ in pairs])
    hits = top2margin = 0
    for i, (_, q) in enumerate(pairs):
        sq = sk(q, cw_bits)
        d = (sq[None] ^ db).sum(1)
        order = np.argsort(d)
        hits += order[0] == i
    return hits / len(pairs)


def main():
    pairs = get_words()
    from cv_tpu.matching import lsh
    from cv_tpu.matching.codebook import unpack as u

    rand = u(lsh.random_codewords())
    trained = u(np.load("/root/repo/cv_tpu/matching/codebook.npy"))
    for name, cw in (("random", rand), ("trained", trained)):
        for sname, sk in (("occupancy", sketch_occupancy), ("profile", sketch_profile)):
            r = recall(pairs, cw, sk)
            # saturation: mean bits set
            bits = np.mean([sk(w, cw).sum() for w, _ in pairs])
            print(f"{name:8s} {sname:10s} recall@1 {r:.2f}  bits set {bits:.0f}")


if __name__ == "__main__":
    main()
