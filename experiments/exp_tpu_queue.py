"""TPU measurement queue — run the moment the axon tunnel recovers.

Phases (each independent; failures don't block the rest):
  1. bench.py main metric (golden gate + fps)
  2. pallas_fed FED-chain extract timing + golden counts vs baseline
  3. select_samples_batched kernel timing at realistic shapes
  4. B=32 stage timings
Usage: python experiments/exp_tpu_queue.py [phase...]  (default: all)
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
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def phase_pallas_fed():
    from cv_tpu.akaze import Akaze, load_gray
    from cv_tpu.akaze.extract import to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor

    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)  # B=8
    for label, kwargs in (
        ("baseline", {}),
        ("pallas_fed", dict(pallas_fed=True)),
        ("pallas_deriv", dict(pallas_deriv=True)),
        ("pallas_mldb", dict(onehot_mode="pallas")),
        (
            "pallas_all",
            dict(pallas_fed=True, pallas_deriv=True, onehot_mode="pallas"),
        ),
    ):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512, **kwargs
        )
        try:
            ms, fs = timeit(ex.extract, batch)
            counts = np.asarray(fs.count)
            print(
                f"{label}: {ms:.2f} ms/batch(B=8), "
                f"counts {counts[:2].tolist()} (golden 399/343)"
            )
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}")


def phase_select_kernel():
    from cv_tpu.akaze import pallas_mldb

    rng = np.random.default_rng(0)
    k, c, ns = 4096, 3, 512
    patches = jnp.asarray(rng.normal(size=(k, c, 128, 128)).astype(np.float32))
    rel_x = jnp.asarray(rng.integers(0, 128, (k, ns)).astype(np.int32))
    rel_y = jnp.asarray(rng.integers(0, 128, (k, ns)).astype(np.int32))
    for name, fn in (
        ("batched(G=8/step)", pallas_mldb.select_samples_batched),
        ("per-keypoint", pallas_mldb.select_samples),
    ):
        try:
            t0 = time.perf_counter()
            out = fn(patches, rel_x, rel_y)
            _sync(out)
            compile_s = time.perf_counter() - t0
            ms, _ = timeit(fn, patches, rel_x, rel_y, n=5)
            print(f"select {name}: {ms:.2f} ms (compile {compile_s:.0f}s) for K=4096 NS=512")
        except Exception as e:
            print(f"select {name}: FAILED {type(e).__name__}: {e}")


def phase_b32():
    import subprocess

    print(subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--stages", "32"],
        capture_output=True, text=True, timeout=1800,
    ).stdout[-2000:])


def phase_bench():
    import subprocess

    print(subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True, text=True, timeout=3600,
    ).stdout[-2000:])


PHASES = {
    "bench": phase_bench,
    "pallas_fed": phase_pallas_fed,
    "select": phase_select_kernel,
    "b32": phase_b32,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["pallas_fed", "select", "b32", "bench"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            PHASES[nm]()
        except Exception as e:
            print(f"{nm} phase failed: {e}")
