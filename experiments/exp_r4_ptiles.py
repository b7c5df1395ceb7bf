"""Round-4: composed extract with the fused tile-select describe ('ptiles')
vs the round-3 patch-buffer path ('pgather'), on the KITTI bench shape.

Usage: python experiments/exp_r4_ptiles.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, "/root/repo")

import experiments.pallas_mldb_losers  # noqa: F401  (registers the retired modes)

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze.fast import DeviceExtractor
from cv_tpu.utils.fixtures import kitti_pair


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=5):
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
    print(f"backend: {jax.default_backend()}")
    p0, p14 = kitti_pair()
    img0 = to_gray_f32(load_gray(p0))
    img14 = to_gray_f32(load_gray(p14))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)

    outs = {}
    for mode in ("pgather", "ptiles"):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            onehot_mode=mode,
        )
        ms, cs, fs = timeit(ex.extract, batch)
        counts = np.asarray(fs.count)
        outs[mode] = fs
        print(
            f"{mode:>8}: {ms:7.2f} ms/batch -> {8e3/ms:6.1f} fps  "
            f"counts {counts[:2]}  compile {cs:.0f}s"
        )
    va = np.asarray(outs["pgather"].valid)
    vb = np.asarray(outs["ptiles"].valid)
    wa = np.asarray(outs["pgather"].words)[va]
    wb = np.asarray(outs["ptiles"].words)[vb]
    print("valid equal:", np.array_equal(va, vb), "words equal:", np.array_equal(wa, wb))


if __name__ == "__main__":
    main()
