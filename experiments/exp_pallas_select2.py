"""TPU perf of the fused Pallas selection vs the XLA two-dot path."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import sys

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze.pallas_mldb import select_samples

K, C, NS = 4096, 3, 512


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, args_fn, n=10):
    out = fn(*args_fn(0))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_fn(i))
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.normal(size=(K, C, 128, 128)).astype(np.float32))
    rx = jnp.asarray(rng.integers(0, 128, (K, NS)), jnp.int32)
    ry = jnp.asarray(rng.integers(0, 128, (K, NS)), jnp.int32)

    fn = jax.jit(lambda p, x, y: select_samples(p, x, y))
    ms, out = timeit(fn, lambda i: (patches, (rx + i) % 128, ry))
    print(f"pallas select: {ms:.2f} ms", flush=True)

    # correctness vs direct indexing
    v = select_samples(patches, rx, ry)
    ref = np.asarray(patches)[
        np.arange(K)[:, None, None],
        np.arange(C)[None, :, None],
        np.asarray(ry)[:, None, :],
        np.asarray(rx)[:, None, :],
    ]
    print("bit-identical:", bool((np.asarray(v) == ref).all()))

    # XLA comparison: the two-einsum one-hot path on the same patches
    def xla_sel(p, x, y):
        iota = jax.lax.broadcasted_iota(jnp.int32, (K, NS, 128), 2)
        ohc = (iota == x[:, :, None]).astype(jnp.float32)
        ohr = (iota == y[:, :, None]).astype(jnp.float32)
        t = jnp.einsum("knw,kchw->knch", ohc, p,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("knh,knch->kcn", ohr, t,
                          precision=jax.lax.Precision.HIGHEST)

    # chunked like production (lax.map over 32 chunks of 128)
    def xla_chunked(p, x, y):
        def do(args):
            pc, xc, yc = args
            iota = jax.lax.broadcasted_iota(jnp.int32, (128, NS, 128), 2)
            ohc = (iota == xc[:, :, None]).astype(jnp.float32)
            ohr = (iota == yc[:, :, None]).astype(jnp.float32)
            t = jnp.einsum("knw,kchw->knch", ohc, pc,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.einsum("knh,knch->kcn", ohr, t,
                              precision=jax.lax.Precision.HIGHEST)
        n = K // 128
        return jax.lax.map(do, (p.reshape(n, 128, C, 128, 128),
                                x.reshape(n, 128, NS),
                                y.reshape(n, 128, NS))).reshape(K, C, NS)

    ms, _ = timeit(jax.jit(xla_chunked), lambda i: (patches, (rx + i) % 128, ry))
    print(f"xla chunked two-dot: {ms:.2f} ms")


if __name__ == "__main__":
    main()
