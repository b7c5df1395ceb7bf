"""Round-5: which formulation makes the pgroups un-permute gather cheap?

The (K,) row gather of (3, 1408) sample blocks measured 19 ms standalone
(exp_r5_groups_micro) — element-granular lowering.  Probe variants at the
bench shape: advanced indexing, jnp.take, flat-2D take, per-channel take,
and the pack-on-padded alternative (scales with the padded row count
instead).

Usage: python experiments/exp_r5_gather_probe.py
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


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
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    npad, k, ns = 15176, 4096, 1408
    vals = jnp.asarray(rng.normal(size=(npad, 3, ns)).astype(np.float32))
    p_of = jnp.asarray(rng.permutation(npad)[:k].astype(np.int32))

    t = timeit(jax.jit(lambda v, p: v[p]), vals, p_of)
    print(f"advanced v[p]            : {t:6.2f} ms", flush=True)
    t = timeit(jax.jit(lambda v, p: jnp.take(v, p, axis=0)), vals, p_of)
    print(f"take axis=0              : {t:6.2f} ms", flush=True)
    v2 = vals.reshape(npad, 3 * ns)
    t = timeit(jax.jit(lambda v, p: v[p]), v2, p_of)
    print(f"flat 2D v[p]             : {t:6.2f} ms", flush=True)
    t = timeit(
        jax.jit(lambda v, p: tuple(v[:, c][p] for c in range(3))), vals, p_of
    )
    print(f"per-channel 2D x3        : {t:6.2f} ms", flush=True)

    t = timeit(
        jax.jit(
            lambda v, p: jax.lax.gather(
                v,
                p[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0,),
                ),
                slice_sizes=(1, 3, ns),
                mode=jax.lax.GatherScatterMode.CLIP,
            )
        ),
        vals,
        p_of,
    )
    print(f"explicit row-slice gather: {t:6.2f} ms", flush=True)

    # scalar gathers at padded scale (the v2 orchestration's cost model)
    sc = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, k, npad).astype(np.int32))
    t = timeit(jax.jit(lambda s, i: s[i]), sc, src)
    print(f"scalar gather K->NPAD    : {t:6.2f} ms", flush=True)

    # pack cost scaling: simulate _mldb_pack-ish work on npad vs k rows
    from cv_tpu.akaze import descriptors as desc

    co = jnp.asarray(rng.normal(size=(npad, 1)).astype(np.float32))
    si = jnp.asarray(rng.normal(size=(npad, 1)).astype(np.float32))
    u = 441
    va = vals[:, :, :u]

    def pack(v, c, s):
        return desc._mldb_pack(v[:, 0], v[:, 1], v[:, 2], c, s, 10)

    t = timeit(jax.jit(pack), va, co, si)
    print(f"pack on NPAD={npad}      : {t:6.2f} ms", flush=True)
    t = timeit(jax.jit(pack), va[:k], co[:k], si[:k])
    print(f"pack on K={k}            : {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
