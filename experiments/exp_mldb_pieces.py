"""Time the orient_mldb pipeline pieces separately on dense patches:
  a. patch extraction (4096 dynamic slices from the padded stack)
  b. orientation selection (109 samples) + angle
  c. mldb selection (441) + pack
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import sys

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import descriptors as desc

K, L, HMAX, WMAX = 4096, 104, 512, 1392
NSD = 512  # padded mldb samples
CHUNK = 128


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


def chunked_select(p, x, y, ns):
    """Two-dot one-hot selection, lax.map over 128-keypoint chunks."""
    c = p.shape[1]

    def do(args):
        pc, xc, yc = args
        iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, ns, 128), 2)
        ohc = (iota == xc[:, :, None]).astype(jnp.float32)
        ohr = (iota == yc[:, :, None]).astype(jnp.float32)
        t = jnp.einsum("knw,kchw->knch", ohc, pc,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("knh,knch->kcn", ohr, t,
                          precision=jax.lax.Precision.HIGHEST)

    n = K // CHUNK
    return jax.lax.map(do, (p.reshape(n, CHUNK, c, 128, 128),
                            x.reshape(n, CHUNK, ns),
                            y.reshape(n, CHUNK, ns))).reshape(K, c, ns)


def main():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, HMAX - 128, K), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, WMAX - 128, K), jnp.int32)

    def extract(st, lv, y, x):
        def one(l, yy, xx):
            zero = jnp.zeros((), l.dtype)
            return jax.lax.dynamic_slice(st, (l, zero, yy, xx), (1, 3, 128, 128))[0]
        return jax.vmap(one)(lv, y, x)

    ms, patches = timeit(jax.jit(extract), lambda i: (stack, lvl, y0, (x0 + i) % (WMAX - 128)))
    print(f"a. patch extraction: {ms:.2f} ms", flush=True)

    rx = jnp.asarray(rng.integers(0, 128, (K, 128)), jnp.int32)
    ry = jnp.asarray(rng.integers(0, 128, (K, 128)), jnp.int32)

    def orient(p, x, y):
        v = chunked_select(p[:, 1:], x, y, 128)  # (K, 2, 128)
        wt = jnp.asarray(np.pad(desc.orientation_table()[2], (0, 19)))
        res_x = wt[None] * v[:, 0]
        res_y = wt[None] * v[:, 1]
        return desc._orientation_from_samples(res_x, res_y)

    ms, angle = timeit(jax.jit(orient), lambda i: (patches, (rx + i) % 128, ry))
    print(f"b. orientation select+angle (109->128): {ms:.2f} ms", flush=True)

    rxm = jnp.asarray(rng.integers(0, 128, (K, NSD)), jnp.int32)
    rym = jnp.asarray(rng.integers(0, 128, (K, NSD)), jnp.int32)

    def mldb(p, x, y, ang):
        v = chunked_select(p, x, y, NSD)[:, :, :441]
        co = jnp.cos(ang)[:, None]
        si = jnp.sin(ang)[:, None]
        return desc._mldb_pack(v[:, 0], v[:, 1], v[:, 2], co, si, 10)

    ms, words = timeit(jax.jit(mldb), lambda i: (patches, (rxm + i) % 128, rym, angle))
    print(f"c. mldb select+pack (441): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
