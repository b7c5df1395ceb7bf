"""Round-3: decompose the Pallas select kernel's 4.3 us/keypoint.

Kernels over grid (512,) with G=8 keypoints per step (same structure as
select_samples_batched) but stripped to one ingredient each:
  dots    — 9 bf16 (512,128)@(128,128) dots per kp on FIXED operands
  dotsbig — 1 bf16 (512,384)@(384,384) dot per kp on fixed operands
  onehot  — one-hot build + colmask reduce only (no dots)
  split   — bf16x3 split of the patch only
  dma     — load patch block, write first rows (DMA cost probe)
"""

import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

K, G, P, NS, C = 4096, 8, 128, 512, 3


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
    return best * 1e3, cs


def k_dots(relx_ref, rely_ref, patch_ref, out_ref):
    ohr = (
        jax.lax.broadcasted_iota(jnp.int32, (NS, P), 1) == rely_ref[0][:, None]
    ).astype(jnp.bfloat16)
    for j in range(G):
        acc = jnp.zeros((NS, P), jnp.float32)
        p1 = patch_ref[j, 0].astype(jnp.bfloat16)
        for _ in range(9):
            acc += jax.lax.dot_general(
                ohr, p1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[j, 0] = jnp.sum(acc[:, :P], axis=1)
        for ch in range(1, C):
            out_ref[j, ch] = out_ref[j, 0]


def k_dotsbig(relx_ref, rely_ref, patch_ref, out_ref):
    ohr = (
        jax.lax.broadcasted_iota(jnp.int32, (NS, 3 * P), 1) % P
        == rely_ref[0][:, None]
    ).astype(jnp.bfloat16)
    for j in range(G):
        p = patch_ref[j, 0]
        pk = jnp.concatenate(
            [p.astype(jnp.bfloat16)] * 3, axis=0
        )  # (3P, P) fixed
        pk3 = jnp.concatenate([pk] * 3, axis=1)  # (3P, 3P)
        t = jax.lax.dot_general(
            ohr, pk3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (NS, 3P)
        out_ref[j, 0] = jnp.sum(t[:, :P], axis=1)
        for ch in range(1, C):
            out_ref[j, ch] = out_ref[j, 0]


def k_onehot(relx_ref, rely_ref, patch_ref, out_ref):
    iota = jax.lax.broadcasted_iota(jnp.int32, (NS, P), 1)
    for j in range(G):
        rx = relx_ref[j]
        ry = rely_ref[j]
        ohr = (iota == ry[:, None]).astype(jnp.bfloat16)
        colmask = iota == rx[:, None]
        t = ohr.astype(jnp.float32) + patch_ref[j, 0, 0, 0]
        for ch in range(C):
            out_ref[j, ch] = jnp.sum(jnp.where(colmask, t, 0.0), axis=1)


def k_split(relx_ref, rely_ref, patch_ref, out_ref):
    for j in range(G):
        acc = jnp.zeros((NS, P), jnp.float32)
        for ch in range(C):
            p = patch_ref[j, ch]
            p1 = p.astype(jnp.bfloat16)
            r1 = p - p1.astype(jnp.float32)
            p2 = r1.astype(jnp.bfloat16)
            p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
            acc += (
                p1.astype(jnp.float32)[:NS]
                + p2.astype(jnp.float32)[:NS]
                + p3.astype(jnp.float32)[:NS]
            )
        for ch in range(C):
            out_ref[j, ch] = acc[:, 0] * 0 + acc[:, 1]


def k_dma(relx_ref, rely_ref, patch_ref, out_ref):
    for j in range(G):
        for ch in range(C):
            out_ref[j, ch] = patch_ref[j, ch, :4].reshape(-1)[:NS]


def run(kernel, name):
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.normal(size=(K, C, P, P)).astype(np.float32))
    rel_x = jnp.asarray(rng.integers(0, P, (K, NS)).astype(np.int32))
    rel_y = jnp.asarray(rng.integers(0, P, (K, NS)).astype(np.int32))
    f = pl.pallas_call(
        kernel,
        grid=(K // G,),
        in_specs=[
            pl.BlockSpec((G, NS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C, P, P), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, C, NS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, C, NS), jnp.float32),
    )
    try:
        ms, cs = timeit(jax.jit(f), rel_x, rel_y, patches)
        print(f"{name}: {ms:.2f} ms (compile {cs:.0f}s) -> {ms / K * 1e3:.2f} us/kp", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["dma", "onehot", "split", "dots", "dotsbig"]
    for nm in names:
        run({"dots": k_dots, "dotsbig": k_dotsbig, "onehot": k_onehot,
             "split": k_split, "dma": k_dma}[nm], nm)
