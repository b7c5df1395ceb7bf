"""Round-5: device A/B of the tile-coherent group describe ('pgroups') vs
the round-3 winner 'pgather' at the bench shape.

'pgroups' removes both the XLA patch cut (18.6 ms at B=8/K=4096 — a
row-gather latency wall) and the 805 MB patch buffer: keypoints sharing a
256x256 tile-aligned window ride one grid step's four shared quadrant DMAs
(cv_tpu/akaze/pallas_mldb.select_samples_groups; window-sorted groups make
consecutive steps' DMAs repeat and be skipped).

Usage: python experiments/exp_r5_pgroups.py [modes...]
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
from cv_tpu.utils.fixtures import fixture_path


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)  # B=8
    modes = [a for a in sys.argv[1:] if not a.isdigit()] or [
        "pgather", "pgroups"
    ]
    outs = {}
    for mf in (512, 4096):
        for mode in modes:
            ex = DeviceExtractor(
                Akaze.sparse(),
                candidate_budget=256 if mf == 512 else 512,
                max_features=mf,
                onehot_mode=mode,
            )
            t0 = time.time()
            try:
                t, fs = timeit(ex.extract, batch)
            except Exception as e:
                print(
                    f"extract B=8 M={mf} {mode:8s}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}",
                    flush=True,
                )
                continue
            counts = np.asarray(fs.count)[:2].tolist()
            outs[(mf, mode)] = fs
            print(
                f"extract B=8 M={mf} {mode:8s}: {t:7.1f} ms/batch = "
                f"{8e3 / t:5.0f} fps | goldens {counts} "
                f"{'OK' if counts == [399, 343] else 'FAIL'} "
                f"(first call {time.time() - t0:.0f}s)",
                flush=True,
            )
        # word equality on valid slots between the two modes
        a = outs.get((mf, "pgather"))
        b = outs.get((mf, "pgroups"))
        if a is not None and b is not None:
            va = np.asarray(a.valid)
            eq_v = np.array_equal(va, np.asarray(b.valid))
            eq_w = np.array_equal(
                np.asarray(a.words)[va], np.asarray(b.words)[va]
            )
            print(f"  M={mf}: valid-equal={eq_v} words-equal={eq_w}", flush=True)


if __name__ == "__main__":
    main()
