"""orient_mldb_interleaved vs orient_mldb_onehot: TPU timing + bit-equality.

Realistic shapes: L=104 planes (B=8 x 13 evolutions), 512x1392 padded to
(512, 3*1408), K=4096 keypoints.
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
    # channel-major stack for onehot: (L, 3, HMAX, WMAX)
    base = rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32)
    planes_cm = jnp.asarray(base)
    # pixel-interleaved: [y, 3x+c]
    inter = np.transpose(base, (0, 2, 3, 1)).reshape(L, HMAX, 3 * WMAX)
    planes_il = jnp.asarray(inter)

    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    width = jnp.full((K,), WMAX, jnp.int32)
    height = jnp.full((K,), HMAX, jnp.int32)
    xf = jnp.asarray(rng.uniform(70, WMAX - 70, K).astype(np.float32))
    yf = jnp.asarray(rng.uniform(70, HMAX - 70, K).astype(np.float32))
    scale = jnp.asarray(rng.integers(1, 5, K).astype(np.float32))

    f_on = jax.jit(
        lambda s, x: desc.orient_mldb_onehot(s, lvl, width, height, x, yf, scale)
    )
    f_il = jax.jit(
        lambda s, x: desc.orient_mldb_interleaved(s, lvl, width, height, x, yf, scale)
    )

    ms_on, out_on = timeit(f_on, lambda i: (planes_cm, xf + i % 3))
    print(f"onehot:      {ms_on:.2f} ms", flush=True)
    ms_il, out_il = timeit(f_il, lambda i: (planes_il, xf + i % 3))
    print(f"interleaved: {ms_il:.2f} ms", flush=True)

    w_on, ok_on, a_on = jax.device_get(f_on(planes_cm, xf))
    w_il, ok_il, a_il = jax.device_get(f_il(planes_il, xf))
    print("words equal:", bool((w_on == w_il).all()))
    print("ok equal:   ", bool((ok_on == ok_il).all()))
    print("angle equal:", bool((a_on == a_il).all()))
    if not (w_on == w_il).all():
        bad = np.nonzero((w_on != w_il).any(axis=1))[0]
        print("first diffs:", bad[:10])


if __name__ == "__main__":
    main()
