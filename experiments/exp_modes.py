"""orient_mldb_onehot mode sweep on TPU: highest / bf16x3 x plain / +fused."""

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
    planes = jnp.asarray(rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    width = jnp.full((K,), WMAX, jnp.int32)
    height = jnp.full((K,), HMAX, jnp.int32)
    xf = jnp.asarray(rng.uniform(70, WMAX - 70, K).astype(np.float32))
    yf = jnp.asarray(rng.uniform(70, HMAX - 70, K).astype(np.float32))
    scale = jnp.asarray(rng.integers(2, 4, K).astype(np.float32))

    ref = None
    for mode in ["highest", "highest+fused", "bf16x3", "bf16x3+fused"]:
        fn = jax.jit(
            lambda s, x, m=mode: desc.orient_mldb_onehot(
                s, lvl, width, height, x, yf, scale, mode=m
            )
        )
        ms, _ = timeit(fn, lambda i: (planes, xf + i % 3))
        out = jax.device_get(fn(planes, xf))
        if ref is None:
            ref = out
            eq = True
        else:
            eq = all(bool((a == b).all()) for a, b in zip(ref, out))
        print(f"{mode:16s}: {ms:6.2f} ms  bit-equal={eq}", flush=True)


if __name__ == "__main__":
    main()
