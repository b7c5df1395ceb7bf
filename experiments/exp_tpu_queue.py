"""TPU measurement queue — standing harness for extractor-level A/B runs.

Round-3 note: the round-2 Pallas FED/derivative kernels this queue was
written to time were measured (exp_r3_pallas_probe.py) at 60x slower than
the XLA path and deleted; the queue now compares the sample-selection
modes that remain plus batch scaling.

Phases (each independent; failures don't block the rest):
  1. bench.py main metric (golden gate + fps)
  2. extract-mode A/B (onehot_mode: highest vs pgather)
  3. b32: per-stage table at B=32
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


def phase_modes():
    from cv_tpu.akaze import Akaze, load_gray
    from cv_tpu.akaze.extract import to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor

    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)  # B=8
    for mode in ("highest", "pgather"):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            onehot_mode=mode,
        )
        try:
            ms, fs = timeit(ex.extract, batch)
            counts = np.asarray(fs.count)
            print(
                f"{mode}: {ms:.2f} ms/batch(B=8), "
                f"counts {counts[:2].tolist()} (golden 399/343)"
            )
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}")


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
    "modes": phase_modes,
    "b32": phase_b32,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["modes", "b32", "bench"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            PHASES[nm]()
        except Exception as e:
            print(f"{nm} phase failed: {e}")
