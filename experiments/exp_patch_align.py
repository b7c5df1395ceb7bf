"""Where does the 15.6ms of per-keypoint patch extraction go?
Variants: full-dynamic (baseline), y-aligned(8), x-aligned(128), both-aligned,
static level, and aligned 136x256 super-patch."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

K, L, HMAX, WMAX = 4096, 104, 512, 1392


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
    stack = jnp.asarray(rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, HMAX - 136, K), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, WMAX - 256, K), jnp.int32)

    def mk(h, w, align_y, align_x, static_lvl):
        def extract(st, lv, y, x):
            def one(l, yy, xx):
                if align_y:
                    yy = (yy // 8) * 8
                if align_x:
                    xx = (xx // 128) * 128
                if static_lvl:
                    l = jnp.zeros((), l.dtype)
                zero = jnp.zeros((), l.dtype)
                return jax.lax.dynamic_slice(st, (l, zero, yy, xx), (1, 3, h, w))[0]
            return jax.vmap(one)(lv, y, x)
        return extract

    import os
    which = os.environ.get("CASES", "0,3,5")
    all_cases = [
        ("full-dynamic 128x128", mk(128, 128, False, False, False)),
        ("y-aligned 128x128", mk(128, 128, True, False, False)),
        ("x-aligned 128x128", mk(128, 128, False, True, False)),
        ("xy-aligned 128x128", mk(128, 128, True, True, False)),
        ("xy-aligned static-lvl", mk(128, 128, True, True, True)),
        ("xy-aligned 136x256", mk(136, 256, True, True, False)),
    ]
    cases = [all_cases[int(i)] for i in which.split(",")]
    for name, fn in cases:
        ms, _ = timeit(jax.jit(fn), lambda i: (stack, lvl, y0, (x0 + i) % (WMAX - 256)))
        print(f"{name}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
