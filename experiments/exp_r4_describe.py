"""Round-4: decompose the describe stage's 18 ms composed marginal.

Pieces timed standalone at the bench shape (B=8 KITTI, K=4096 keypoints,
512/frame):
  stack    — padded_plane_stack build (13 evolutions -> (104, 3, 512, 1392))
  slice    — per-keypoint (3, 128, 128) dynamic_slice extraction (chunked)
  pgather  — the Pallas sample-selection kernel on pre-cut patches
  orient   — the 42-window orientation math from gathered samples
  pack     — cell means + 486 comparisons + bit-pack
  full     — stage_describe composed
Usage: python experiments/exp_r4_describe.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze import descriptors as desc
from cv_tpu.akaze import fast
from cv_tpu.akaze.fast import DeviceExtractor
from cv_tpu.akaze.scale_space import build_scale_space
from cv_tpu.utils.fixtures import kitti_pair


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=5):
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


def main():
    print(f"backend: {jax.default_backend()}")
    p0, p14 = kitti_pair()
    img0 = to_gray_f32(load_gray(p0))
    img14 = to_gray_f32(load_gray(p14))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)

    ex = DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
    cfg = ex.config
    b, h, w = batch.shape
    specs = ex._helper.specs(h, w)

    @jax.jit
    def to_sel(images):
        planes = build_scale_space(cfg, specs, images)
        cand = fast.stage_candidates(cfg, specs, planes, 256, ex.topk_method)
        cand = fast.stage_dedup(cand, 256, ex.dedup_scan_cap)
        sel = fast.stage_refine_select(cfg, specs, cand, planes, 256, 512)
        arrs = tuple((p.lt, p.lsmooth, p.lx, p.ly, p.ldet) for p in planes)
        return sel, arrs

    sel, plane_arrs = to_sel(batch)
    sel = jax.tree_util.tree_map(lambda x: x, sel)

    from cv_tpu.akaze.scale_space import EvolutionPlanes

    def planes_of(arrs):
        return [
            EvolutionPlanes(spec=s, lt=a[0], lsmooth=a[1], lx=a[2], ly=a[3], ldet=a[4])
            for s, a in zip(specs, arrs)
        ]

    # 1. padded stack build.
    j_stack = jax.jit(lambda arrs: fast.padded_plane_stack(planes_of(arrs)))
    ms, planes_padded = timeit(j_stack, plane_arrs)
    print(f"stack build: {ms:7.2f} ms  ({planes_padded.shape}, "
          f"{planes_padded.nbytes/1e6:.0f} MB)")

    n_evo = len(specs)
    lvl = (jnp.arange(b, dtype=jnp.int32)[:, None] * n_evo + sel["cls"]).reshape(-1)
    xf = (sel["px"] / sel["pw"]).reshape(-1)
    yf = (sel["py"] / sel["pw"]).reshape(-1)
    k_total = xf.shape[0]
    print(f"keypoint slots: {k_total}")

    # 2. patch slices alone (chunked like the pipeline).
    p = 128
    chunk = 512
    hmax, wmax = planes_padded.shape[2], planes_padded.shape[3]
    y0 = jnp.clip(yf.astype(jnp.int32) - p // 2, 0, hmax - p)
    x0 = jnp.clip(xf.astype(jnp.int32) - p // 2, 0, wmax - p)

    @jax.jit
    def slice_all(planes, lvl, y0, x0):
        def do_chunk(args):
            lvl_c, y0_c, x0_c = args

            def slice_one(l, y, x):
                zero = jnp.zeros((), l.dtype)
                return jax.lax.dynamic_slice(
                    planes, (l, zero, y, x), (1, 3, p, p)
                )[0]

            return jax.vmap(slice_one)(lvl_c, y0_c, x0_c)

        nch = k_total // chunk
        return jax.lax.map(
            do_chunk,
            (lvl.reshape(nch, chunk), y0.reshape(nch, chunk), x0.reshape(nch, chunk)),
        )

    ms, patches = timeit(slice_all, planes_padded, lvl, y0, x0)
    print(f"patch slice: {ms:7.2f} ms  ({patches.nbytes/1e6:.0f} MB out)")

    # 3. pgather select alone on one chunk x nch.
    from cv_tpu.akaze import pallas_mldb

    rng = np.random.default_rng(0)
    ns = 512
    relx = jnp.asarray(rng.integers(0, 128, (chunk, ns), dtype=np.int32))
    rely = jnp.asarray(rng.integers(0, 128, (chunk, ns), dtype=np.int32))

    @jax.jit
    def pg_all(patches, relx, rely):
        def do_chunk(pc):
            return pallas_mldb.select_samples_gather(pc, relx, rely)

        return jax.lax.map(do_chunk, patches)

    ms, _ = timeit(pg_all, patches, relx, rely)
    print(f"pgather select (8x512x512): {ms:7.2f} ms")

    # 4. orientation window math alone (samples -> angle).
    res = jnp.asarray(rng.normal(size=(k_total, 2, 109)).astype(np.float32))

    @jax.jit
    def orient_math(res):
        return desc._orientation_from_samples(res[:, 0], res[:, 1])

    ms, _ = timeit(orient_math, res)
    print(f"orientation windows math: {ms:7.2f} ms")

    # 5. pack alone.
    vals = jnp.asarray(rng.normal(size=(k_total, 3, 441)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(k_total, 1)).astype(np.float32))
    si = jnp.asarray(rng.normal(size=(k_total, 1)).astype(np.float32))

    @jax.jit
    def pack(vals, co, si):
        return desc._mldb_pack(vals[:, 0], vals[:, 1], vals[:, 2], co, si, 10)

    ms, _ = timeit(pack, vals, co, si)
    print(f"mldb pack: {ms:7.2f} ms")

    # 6. stage_describe composed.
    j_desc = jax.jit(
        lambda arrs, s: fast.stage_describe(
            cfg, planes_of(arrs), s, ex.sampler, ex.onehot_mode
        )
    )
    ms, _ = timeit(j_desc, plane_arrs, sel)
    print(f"stage_describe composed: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
