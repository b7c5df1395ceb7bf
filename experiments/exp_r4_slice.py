"""Round-4: patch-extraction formulations.

The describe stage's per-keypoint (3, 128, 128) patch cut via vmapped
dynamic_slice runs at 18.6 ms for 4096 patches (~43 GB/s — latency-bound,
not bandwidth).  Gather cost on this TPU is ~18 ns/index regardless of
slice size (perf-notes round 1), so fewer-indices formulations should win:

  vmap_ds   — current: lax.map over 512-chunks of vmapped dynamic_slice
  gather1   — ONE lax.gather, slice_sizes (1, 3, 128, 128): 4096 indices
  gather8   — slices (1, 3, 8, 128): 4096 x 16 row-block indices
  gatherrow — slices (1, 3, 1, 128): 4096 x 128 row indices
Usage: python experiments/exp_r4_slice.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, "/root/repo")


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


L, C, H, W = 104, 3, 512, 1392
K = 4096
P = 128


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(L, C, H, W)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K, dtype=np.int32))
    y0 = jnp.asarray(rng.integers(0, H - P, K, dtype=np.int32))
    x0 = jnp.asarray(rng.integers(0, W - P, K, dtype=np.int32))

    chunk = 512

    @jax.jit
    def vmap_ds(planes, lvl, y0, x0):
        def do_chunk(args):
            l_c, y_c, x_c = args

            def one(l, y, x):
                zero = jnp.zeros((), l.dtype)
                return jax.lax.dynamic_slice(planes, (l, zero, y, x), (1, C, P, P))[0]

            return jax.vmap(one)(l_c, y_c, x_c)

        nch = K // chunk
        return jax.lax.map(
            do_chunk,
            (lvl.reshape(nch, chunk), y0.reshape(nch, chunk), x0.reshape(nch, chunk)),
        ).reshape(K, C, P, P)

    ms, ref = timeit(vmap_ds, planes, lvl, y0, x0)
    print(f"vmap_ds:   {ms:7.2f} ms")

    @jax.jit
    def gather1(planes, lvl, y0, x0):
        starts = jnp.stack(
            [lvl, jnp.zeros_like(lvl), y0, x0], axis=1
        )  # (K, 4)
        return jax.lax.gather(
            planes,
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3),
            ),
            slice_sizes=(1, C, P, P),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    ms, out = timeit(gather1, planes, lvl, y0, x0)
    print(f"gather1:   {ms:7.2f} ms  equal={bool(jnp.array_equal(ref, out))}")

    @jax.jit
    def gather8(planes, lvl, y0, x0):
        rows = jnp.arange(P // 8, dtype=jnp.int32) * 8
        l_b = jnp.repeat(lvl, P // 8)
        y_b = (y0[:, None] + rows[None, :]).reshape(-1)
        x_b = jnp.repeat(x0, P // 8)
        starts = jnp.stack([l_b, jnp.zeros_like(l_b), y_b, x_b], axis=1)
        out = jax.lax.gather(
            planes,
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3),
            ),
            slice_sizes=(1, C, 8, P),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (K * 16, C, 8, P)
        return (
            out.reshape(K, P // 8, C, 8, P).transpose(0, 2, 1, 3, 4).reshape(K, C, P, P)
        )

    ms, out = timeit(gather8, planes, lvl, y0, x0)
    print(f"gather8:   {ms:7.2f} ms  equal={bool(jnp.array_equal(ref, out))}")


def main2():
    """gather8 without the transpose: emit (K, 16, C, 8, P) as gathered."""
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.normal(size=(L, C, H, W)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K, dtype=np.int32))
    y0 = jnp.asarray(rng.integers(0, H - P, K, dtype=np.int32))
    x0 = jnp.asarray(rng.integers(0, W - P, K, dtype=np.int32))

    @jax.jit
    def gather8_raw(planes, lvl, y0, x0):
        rows = jnp.arange(P // 8, dtype=jnp.int32) * 8
        l_b = jnp.repeat(lvl, P // 8)
        y_b = (y0[:, None] + rows[None, :]).reshape(-1)
        x_b = jnp.repeat(x0, P // 8)
        starts = jnp.stack([l_b, jnp.zeros_like(l_b), y_b, x_b], axis=1)
        out = jax.lax.gather(
            planes,
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3),
            ),
            slice_sizes=(1, C, 8, P),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (K * 16, C, 8, P)
        return out.reshape(K, P // 8, C, 8, P)

    ms, raw = timeit(gather8_raw, planes, lvl, y0, x0)
    print(f"gather8_raw: {ms:7.2f} ms  ({raw.nbytes/1e6:.0f} MB out)")
    # Verify values against the plain cut for a few keypoints.
    pn = np.asarray(planes)
    rawn = np.asarray(raw[:4])
    l0, yy, xx = np.asarray(lvl[:4]), np.asarray(y0[:4]), np.asarray(x0[:4])
    ok = True
    for kk in range(4):
        want = pn[l0[kk], :, yy[kk]:yy[kk]+P, xx[kk]:xx[kk]+P]
        got = rawn[kk].transpose(1, 0, 2, 3).reshape(C, P, P)
        ok &= np.array_equal(want, got)
    print("values ok:", ok)


if __name__ == "__main__":
    main2() if "raw" in sys.argv else main()
