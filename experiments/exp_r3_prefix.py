"""Round-3: composed-program prefix timings + describe-stage variants.

The per-stage harness (bench.py --stages) times each stage as its own XLA
program, paying HBM materialization at every boundary; the composed extract
is 45 ms vs the 71 ms stage sum (B=8), so optimization targets must come
from COMPOSED marginal costs: time nested prefixes of the real pipeline and
difference them.

Usage: python experiments/exp_r3_prefix.py [prefix] [modes]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import Akaze, load_gray
from cv_tpu.akaze.extract import to_gray_f32
from cv_tpu.akaze import fast
from cv_tpu.akaze.scale_space import build_scale_space


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=10):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def batch_images(b=8):
    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    return jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * (b // 2))


def prefix_main(b=8):
    batch = batch_images(b)
    ex = fast.DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
    cfg, k, m = ex.config, ex.candidate_budget, ex.max_features
    specs = ex._helper.specs(batch.shape[1], batch.shape[2])

    def p_scale(images):
        planes = build_scale_space(cfg, specs, images)
        return tuple(p.ldet for p in planes)

    def p_cand(images):
        planes = build_scale_space(cfg, specs, images)
        cand = fast.stage_candidates(cfg, specs, planes, k, ex.topk_method)
        return tuple(c["resp"] for c in cand)

    def p_dedup(images):
        planes = build_scale_space(cfg, specs, images)
        cand = fast.stage_candidates(cfg, specs, planes, k, ex.topk_method)
        cand = fast.stage_dedup(cand, k, ex.dedup_scan_cap)
        return tuple(c["valid"] for c in cand)

    def p_refine(images):
        planes = build_scale_space(cfg, specs, images)
        cand = fast.stage_candidates(cfg, specs, planes, k, ex.topk_method)
        cand = fast.stage_dedup(cand, k, ex.dedup_scan_cap)
        sel = fast.stage_refine_select(cfg, specs, cand, planes, k, m)
        return (sel["resp"], sel["px"])

    prev = 0.0
    for name, fn in (
        ("scale_space", p_scale),
        ("+candidates", p_cand),
        ("+dedup", p_dedup),
        ("+refine", p_refine),
        ("+describe(full)", ex.extract),
    ):
        ms, out = timeit(jax.jit(fn) if fn is not ex.extract else fn, batch)
        print(f"{name:>18}: {ms:8.2f} ms  (marginal {ms - prev:+7.2f})", flush=True)
        prev = ms
    if hasattr(out, "count"):
        print("counts:", np.asarray(out.count)[:2].tolist())


def modes_main(b=8):
    """Describe-stage one-hot variants, composed after a fixed prefix."""
    batch = batch_images(b)
    for mode in ("highest", "highest+fused", "bf16x3", "bf16x3+fused"):
        ex = fast.DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512, onehot_mode=mode
        )
        try:
            ms, out = timeit(ex.extract, batch)
            counts = np.asarray(out.count)[:2].tolist()
            print(f"mode {mode:>14}: {ms:8.2f} ms  counts {counts}", flush=True)
        except Exception as e:
            print(f"mode {mode:>14}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["prefix", "modes"]
    b = 8
    for a in which:
        if a.isdigit():
            b = int(a)
    if "prefix" in which:
        print(f"=== composed prefixes B={b} ===")
        prefix_main(b)
    if "modes" in which:
        print(f"=== onehot modes B={b} ===")
        modes_main(b)
