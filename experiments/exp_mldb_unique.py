"""Measure orient_mldb variants on the real chip.

Baseline (round 2): 32.8 ms at K=4096 with 1241 raw samples and a second
dot_general producing a (chunk, ns, 3, 128) HBM intermediate.

Variants here:
  A. unique-441 samples (current descriptors.py after the refactor)
  B. unique-441 + second contraction as mult+sum (fusion attempt: the
     broadcast-multiply + reduce can fuse into the producer dot's output,
     keeping the (chunk, ns, 3, 128) intermediate out of HBM)
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

K_TOTAL = 4096
L = 104
HMAX, WMAX = 512, 1392


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    planes = jnp.asarray(
        rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32)
    )
    lvl = jnp.asarray(rng.integers(0, L, K_TOTAL), jnp.int32)
    width = jnp.full((K_TOTAL,), WMAX, jnp.int32)
    height = jnp.full((K_TOTAL,), HMAX, jnp.int32)
    xf = jnp.asarray(rng.uniform(70, WMAX - 70, K_TOTAL).astype(np.float32))
    yf = jnp.asarray(rng.uniform(70, HMAX - 70, K_TOTAL).astype(np.float32))
    scale = jnp.asarray(rng.choice([2.0, 3.0, 4.0], K_TOTAL).astype(np.float32))
    return planes, lvl, width, height, xf, yf, scale


def main():
    args = make_inputs()

    fn_a = jax.jit(
        lambda *a: desc.orient_mldb_onehot(*a, pattern_size=10, mode="highest")
    )
    ms, out_a = timeit(fn_a, *args)
    print(f"A unique-441 highest: {ms:.2f} ms  (prev 1241 baseline: 32.8)")

    for name, mode in [
        ("B highest+fused", "highest+fused"),
        ("C bf16x3", "bf16x3"),
        ("D bf16x3+fused", "bf16x3+fused"),
    ]:
        fn = jax.jit(
            lambda *a, m=mode: desc.orient_mldb_onehot(*a, pattern_size=10, mode=m)
        )
        ms, out = timeit(fn, *args)
        same = bool(jnp.all(out_a[0] == out[0]))
        print(f"{name}: {ms:.2f} ms  bit-identical={same}")


if __name__ == "__main__":
    main()
