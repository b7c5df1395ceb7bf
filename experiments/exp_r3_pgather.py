"""Round-3: device timing of the hardware-gather select kernel + the full
extractor with onehot_mode='pgather'."""

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


def phase_kernel():
    from cv_tpu.akaze import pallas_mldb

    rng = np.random.default_rng(0)
    k, c, ns = 4096, 3, 512
    patches = rng.normal(size=(k, c, 128, 128)).astype(np.float32)
    rel_x = rng.integers(0, 128, (k, ns)).astype(np.int32)
    rel_y = rng.integers(0, 128, (k, ns)).astype(np.int32)
    for g in (8, 16):
        try:
            ms, cs, out = timeit(
                lambda a, b, d: pallas_mldb.select_samples_gather(a, b, d, g=g),
                jnp.asarray(patches), jnp.asarray(rel_x), jnp.asarray(rel_y),
                n=5,
            )
            o = np.asarray(out[:8])
            ref = patches[
                np.arange(8)[:, None, None],
                np.arange(c)[None, :, None],
                rel_y[:8][:, None, :],
                rel_x[:8][:, None, :],
            ]
            print(
                f"pgather g={g}: {ms:.2f} ms (compile {cs:.0f}s) "
                f"-> {ms / k * 1e3:.2f} us/kp exact={np.array_equal(o, ref)}",
                flush=True,
            )
        except Exception as e:
            print(f"pgather g={g}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)


def phase_extract():
    from cv_tpu.akaze import Akaze, load_gray
    from cv_tpu.akaze.extract import to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor

    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)
    base = None
    for mode in ("highest", "pgather"):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            onehot_mode=mode,
        )
        try:
            ms, cs, fs = timeit(ex.extract, batch)
            counts = np.asarray(fs.count)[:2].tolist()
            w = np.asarray(fs.words)
            v = np.asarray(fs.valid)
            key = (w * v[..., None]).ravel()
            same = "n/a" if base is None else bool((key == base).all())
            base = key if base is None else base
            print(
                f"extract mode={mode}: {ms:.2f} ms (compile {cs:.0f}s) "
                f"counts {counts} valid_words_equal={same}", flush=True,
            )
        except Exception as e:
            print(f"extract mode={mode}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["kernel", "extract"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        {"kernel": phase_kernel, "extract": phase_extract}[nm]()
