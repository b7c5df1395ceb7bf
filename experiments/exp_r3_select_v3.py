"""Round-3: K-stacked bf16x3 selection — XLA mode vs Pallas kernel, on TPU.

Phases:
  extract — full DeviceExtractor with onehot_mode in {highest, bf16x3k}
  kernel  — standalone select_samples_k vs select_samples_batched, K=4096
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


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


def phase_extract():
    from cv_tpu.akaze import Akaze, load_gray
    from cv_tpu.akaze.extract import to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor

    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)
    base_words = None
    for mode in ("highest", "bf16x3k"):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            onehot_mode=mode,
        )
        try:
            ms, cs, fs = timeit(ex.extract, batch)
            counts = np.asarray(fs.count)[:2].tolist()
            words = np.asarray(fs.words)
            same = (
                "n/a" if base_words is None else bool((words == base_words).all())
            )
            base_words = words if base_words is None else base_words
            print(
                f"extract mode={mode}: {ms:.2f} ms (compile {cs:.0f}s) "
                f"counts {counts} words_equal={same}", flush=True,
            )
        except Exception as e:
            print(f"extract mode={mode}: FAILED {type(e).__name__}: {str(e)[:250]}")


def phase_kernel():
    from cv_tpu.akaze import pallas_mldb

    rng = np.random.default_rng(0)
    k, c, ns = 4096, 3, 512
    patches = rng.normal(size=(k, c, 128, 128)).astype(np.float32)
    patches_t = jnp.asarray(
        patches.transpose(0, 2, 1, 3).reshape(k, 128, c * 128)
    )
    rel_x = jnp.asarray(rng.integers(0, 128, (k, ns)).astype(np.int32))
    rel_y = jnp.asarray(rng.integers(0, 128, (k, ns)).astype(np.int32))
    for g in (8, 32):
        try:
            ms, cs, out = timeit(
                lambda a, b, d: pallas_mldb.select_samples_k(a, b, d, g=g),
                patches_t, rel_x, rel_y, n=5,
            )
            # spot-check correctness on device output
            o = np.asarray(out[:4])
            ref = patches[
                np.arange(4)[:, None, None],
                np.arange(c)[None, :, None],
                np.asarray(rel_y[:4])[:, None, :],
                np.asarray(rel_x[:4])[:, None, :],
            ]
            print(
                f"select_k g={g}: {ms:.2f} ms (compile {cs:.0f}s) "
                f"exact={np.array_equal(o, ref)}", flush=True,
            )
        except Exception as e:
            print(f"select_k g={g}: FAILED {type(e).__name__}: {str(e)[:250]}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["kernel", "extract"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            {"extract": phase_extract, "kernel": phase_kernel}[nm]()
        except Exception as e:
            print(f"{nm} failed: {e}")
