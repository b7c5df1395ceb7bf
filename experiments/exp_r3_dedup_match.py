"""Round-3: decompose the dedup stage (+7.1 ms composed marginal) and time
Hamming match variants (VPU popcount vs int8 MXU) at bench shapes."""

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
from cv_tpu.akaze import fast, extrema
from cv_tpu.akaze.scale_space import build_scale_space


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=10):
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


def get_cand(b=8, k=256):
    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * (b // 2))
    ex = fast.DeviceExtractor(Akaze.sparse(), candidate_budget=k, max_features=512)
    cfg = ex.config
    specs = ex._helper.specs(batch.shape[1], batch.shape[2])

    @jax.jit
    def run(images):
        planes = build_scale_space(cfg, specs, images)
        cand = fast.stage_candidates(cfg, specs, planes, k, ex.topk_method)
        return tuple(
            {f: c[f] for f in ("x", "y", "px", "py", "resp", "idx", "valid")}
            for c in cand
        )

    stripped = jax.device_get(run(batch))
    out = []
    for s, c in zip(specs, stripped):
        d = {f: jnp.asarray(v) for f, v in c.items()}
        d["spec"] = s
        d["size"] = np.float32(np.float32(s.esigma) * np.float32(cfg.derivative_factor))
        out.append(d)
    return out, ex


def phase_dedup():
    cand, ex = get_cand()
    k, cap = ex.candidate_budget, ex.dedup_scan_cap

    def strip(cs):
        return tuple(c["valid"] for c in cs)

    ms, cs_, _ = timeit(jax.jit(lambda c: strip(fast.stage_dedup(
        [dict(x, spec=s["spec"], size=s["size"]) for x, s in zip(
            [{f: c[f] for f in ("x", "y", "px", "py", "resp", "idx", "valid")} for c in cand],
            cand)], k, cap))), None)
    print(f"dedup full: {ms:.2f} ms")


def phase_dedup_pieces():
    import functools

    cand, ex = get_cand()
    k, cap = ex.candidate_budget, ex.dedup_scan_cap
    fields = ("x", "y", "px", "py", "resp", "idx", "valid")
    data = tuple({f: c[f] for f in fields} for c in cand)
    specs = [c["spec"] for c in cand]
    sizes = [c["size"] for c in cand]

    def rebuild(d):
        return [dict(x, spec=s, size=z) for x, s, z in zip(d, specs, sizes)]

    # full
    ms, _, _ = timeit(
        jax.jit(lambda d: tuple(c["valid"] for c in fast.stage_dedup(rebuild(d), k, cap))),
        data,
    )
    print(f"dedup full: {ms:.2f} ms", flush=True)

    # pieces: monkey-patch the scan away (prefilter + compaction only)
    orig_scan = extrema.dedup_scan_device
    try:
        extrema.dedup_scan_device = lambda *a: a[7]  # return valid&conf as-is
        ms, _, _ = timeit(
            jax.jit(lambda d: tuple(c["valid"] for c in fast.stage_dedup(rebuild(d), k, cap))),
            data,
        )
        print(f"dedup no-scan (prefilter+compaction): {ms:.2f} ms", flush=True)
    finally:
        extrema.dedup_scan_device = orig_scan


def phase_match():
    from cv_tpu.matching import hamming

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**32, (512, 16), dtype=np.uint64).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (512, 16), dtype=np.uint64).astype(np.uint32))
    for name, fn in (
        ("vpu popcount", hamming.distance_matrix),
        ("int8 mxu", hamming.distance_matrix_mxu),
    ):
        ms, cs, out = timeit(jax.jit(fn), a, b)
        print(f"match {name}: {ms:.3f} ms (compile {cs:.0f}s)", flush=True)
    d1 = np.asarray(hamming.distance_matrix(a, b))
    d2 = np.asarray(hamming.distance_matrix_mxu(a, b))
    print("equal:", np.array_equal(d1, d2))
    # batched like the bench: 4 pairs under vmap
    aw = jnp.asarray(rng.integers(0, 2**32, (4, 512, 16), dtype=np.uint64).astype(np.uint32))
    bw = jnp.asarray(rng.integers(0, 2**32, (4, 512, 16), dtype=np.uint64).astype(np.uint32))
    for name, fn in (
        ("vpu popcount", hamming.distance_matrix),
        ("int8 mxu", hamming.distance_matrix_mxu),
    ):
        ms, cs, out = timeit(jax.jit(jax.vmap(fn)), aw, bw)
        print(f"match4 {name}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["match", "dedup_pieces"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            {"match": phase_match, "dedup_pieces": phase_dedup_pieces,
             "dedup": phase_dedup}[nm]()
        except Exception as e:
            import traceback
            traceback.print_exc()
