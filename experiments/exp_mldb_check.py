"""Validate the suspicious 0.42ms orient_mldb result: fresh inputs each
iteration, checksum printed, and a gather-path cross-check."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import sys

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import descriptors as desc
from exp_mldb_unique import make_inputs, K_TOTAL


def main():
    planes, lvl, width, height, xf, yf, scale = make_inputs()

    for mode in ["highest", "highest+fused"]:
        fn = jax.jit(
            lambda *a, m=mode: desc.orient_mldb_onehot(*a, pattern_size=10, mode=m)
        )
        # fresh xf each iter so nothing can be cached/CSE'd across calls
        outs = []
        fn(planes, lvl, width, height, xf, yf, scale)  # compile
        t0 = time.perf_counter()
        n = 10
        for i in range(n):
            out = fn(planes, lvl, width, height, xf + 0.001 * i, yf, scale)
            outs.append(out)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n * 1e3
        w0 = outs[0][0]
        print(f"{mode}: {dt:.2f} ms  checksum={int(jnp.sum(w0 & 1))} "
              f"ok={int(jnp.sum(outs[0][1]))}")

    # gather-path cross-check on the same inputs (angle from onehot path)
    words_o, ok_o, angle_o = jax.jit(
        lambda *a: desc.orient_mldb_onehot(*a, pattern_size=10, mode="highest")
    )(planes, lvl, width, height, xf, yf, scale)
    flat_pack = jnp.transpose(planes, (0, 2, 3, 1)).reshape(-1, 3)
    base = lvl * (planes.shape[2] * planes.shape[3])
    words_g, ok_g = jax.jit(desc.mldb_flat)(
        flat_pack, base, width, height, xf, yf, scale, angle_o
    )
    print("gather-vs-onehot words identical:", bool(jnp.all(words_o == words_g)),
          " ok identical:", bool(jnp.all(ok_o == ok_g)))


if __name__ == "__main__":
    main()
