"""Probe: ELEMENT-offset patch DMA (select_samples_epatch) on the device.

The describe stage's patch cut is gather-row-latency bound (18.6 ms for
4096 keypoints at B=8); 'pepatch' moves the cut into the Pallas BlockSpec
as per-keypoint pl.Element offsets — the DMA engine lands the exact
128x128x3 patch, the kernel runs the proven per-tile gather select
(1.47 us/kp), and no patch buffer exists.

UNKNOWNS this probe answers on the v5e:
  1. Does Mosaic accept pl.Element dims with PrefetchScalarGridSpec at all?
  2. Standalone: epatch select vs XLA cut + pgather select (bench shape).
  3. Full extract: onehot_mode 'pepatch' vs 'pgather' vs 'pgather+inter'
     (KITTI goldens as the correctness gate).

Usage: python experiments/exp_r4_epatch.py [kernel|extract ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

P = 128


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


def phase_kernel():
    from cv_tpu.akaze import pallas_mldb as pm
    from experiments import pallas_mldb_losers as losers

    rng = np.random.default_rng(0)
    l, c, hp, wp, k, ns = 96, 3, 512, 1408, 4096, 1280
    # Generate the 830 MB plane stack ON DEVICE — materializing it on host
    # and pushing it through the axon tunnel dominates any timeout.
    planes = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (l, c, hp, wp), jnp.float32)
    )()
    _sync(planes)
    print("planes resident on device", flush=True)
    lvl = jnp.asarray(rng.integers(0, l, k).astype(np.int32))
    y0 = jnp.asarray(rng.integers(0, hp - P, k).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, wp - P, k).astype(np.int32))
    rx = jnp.asarray(rng.integers(0, P, (k, ns)).astype(np.int32))
    ry = jnp.asarray(rng.integers(0, P, (k, ns)).astype(np.int32))

    import functools

    @jax.jit
    def cut_plus_pgather(planes, lvl, y0, x0, rx, ry):
        def one(ll, y, x):
            zero = jnp.zeros((), ll.dtype)
            return jax.lax.dynamic_slice(planes, (ll, zero, y, x), (1, 3, P, P))[0]

        patches = jax.vmap(one)(lvl, y0, x0)
        return pm.select_samples_gather(patches, rx, ry)

    print("timing cut+pgather (compiles first)...", flush=True)
    t_ref, ref = timeit(cut_plus_pgather, planes, lvl, y0, x0, rx, ry)
    print(f"cut+pgather {t_ref:.2f} ms; timing epatch (Mosaic compile)...", flush=True)
    t_ep, out = timeit(losers.select_samples_epatch, planes, lvl, y0, x0, rx, ry)
    equal = np.array_equal(np.asarray(ref), np.asarray(out))
    print(
        f"kernel: cut+pgather {t_ref:.2f} ms | epatch {t_ep:.2f} ms | "
        f"bit-equal={equal}"
    )


def phase_extract():
    from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor
    from cv_tpu.utils.fixtures import fixture_path

    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)  # B=8
    # Modes = any argv tokens that are not phase names (argv[1:] mixes
    # phases and modes: `exp_r4_epatch.py kernel extract pgather`).
    modes = [a for a in sys.argv[1:] if a not in ("kernel", "extract")] or [
        "pgather", "pepatch", "pgather+inter"
    ]
    for mode in modes:
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=512, max_features=4096,
            onehot_mode=mode,
        )
        try:
            t, fs = timeit(ex.extract, batch, n=5)
        except Exception as e:  # pepatch: Mosaic rejects mixed Element dims
            print(f"extract B=8 {mode:14s}: FAILED {type(e).__name__}", flush=True)
            continue
        counts = np.asarray(fs.count)[:2].tolist()
        print(
            f"extract B=8 {mode:14s}: {t:.1f} ms/batch = {8e3 / t:.0f} fps | "
            f"goldens {counts} {'OK' if counts == [399, 343] else 'FAIL'}",
            flush=True,
        )


if __name__ == "__main__":
    phases = sys.argv[1:] or ["kernel", "extract"]
    if "kernel" in phases:
        phase_kernel()
    if "extract" in phases:
        phase_extract()
