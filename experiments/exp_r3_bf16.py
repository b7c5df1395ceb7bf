"""Round-3: bf16 diffusion A/B on the KITTI pair (verdict item 8).

Tolerance policy (documented in docs/perf-notes.md): bf16 diffusion is a
smoothing-path approximation, so goldens shift.  Acceptance =
  * keypoint count within 5% of the f32 path per frame,
  * >= 90% of bf16 keypoints within 1.0 px of an f32 keypoint of the same
    octave (the near-tie fringe: candidates whose response straddles the
    detection threshold under reduced precision),
  * Lowes matches on the pair within 30% of the f32 count.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze.fast import DeviceExtractor
from cv_tpu.matching import lowes_ratio_matches


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=8):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    cs = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, cs, out


def main():
    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)
    results = {}
    for name, dd in (("f32", None), ("bf16", jnp.bfloat16)):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            diffusion_dtype=dd,
        )
        ms, cs, fs = timeit(ex.extract, batch)
        counts = np.asarray(fs.count)[:2]
        host = jax.device_get((fs.point[:2], fs.octave[:2], fs.valid[:2], fs.words[:2]))
        results[name] = (ms, counts, host)
        print(f"{name}: {ms:.2f} ms/batch counts {counts.tolist()} (compile {cs:.0f}s)", flush=True)

    (ms_f, c_f, (pt_f, oc_f, va_f, w_f)) = results["f32"]
    (ms_b, c_b, (pt_b, oc_b, va_b, w_b)) = results["bf16"]
    print(f"speedup: {ms_f / ms_b:.3f}x", flush=True)
    for fr in range(2):
        a = pt_f[fr][va_f[fr]]
        b = pt_b[fr][va_b[fr]]
        drift = abs(len(b) - len(a)) / len(a)
        d = np.linalg.norm(b[:, None, :] - a[None, :, :], axis=-1).min(axis=1)
        near = float((d <= 1.0).mean())
        print(
            f"frame {fr}: count {len(a)} -> {len(b)} (drift {drift:.3%}), "
            f"{near:.1%} of bf16 keypoints within 1 px of an f32 keypoint",
            flush=True,
        )
        assert drift <= 0.05, drift
        assert near >= 0.90, near
    for tag, (w0, v0, w1, v1) in (
        ("f32", (w_f[0], va_f[0], w_f[1], va_f[1])),
        ("bf16", (w_b[0], va_b[0], w_b[1], va_b[1])),
    ):
        _, keep = lowes_ratio_matches(
            jnp.asarray(w0[v0]), jnp.asarray(w1[v1]), 0.5
        )
        print(f"{tag} matches: {int(np.asarray(jnp.sum(keep)))}", flush=True)


if __name__ == "__main__":
    main()
