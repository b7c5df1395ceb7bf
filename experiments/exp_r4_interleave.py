"""Probe: channel-interleaved patch cut vs the channel-major cut.

The describe stage's patch cut is gather-ROW-latency bound (~12-18 ns/row
regardless of slice width, docs/perf-notes.md round 4): a (1, 3, 128, 128)
slice per keypoint decomposes into 384 row fetches.  If the plane stack is
pixel-interleaved on the lane axis — (L, Hp, 3*Wp) with channel fastest,
x*3 + ch — the same patch is ONE (1, 128, 384) slice = 128 rows, 3x fewer,
at the cost of one (K, 128, 384) -> (K, 3, 128, 128) de-interleave
transpose (pure BW, ~2 ms for 805 MB at B=8).

UNKNOWN this probe answers: whether the v5e gather decomposes 384-wide rows
into one copy each (3x win) or into three 128-lane copies (no win).

Phases:
  cut      — time channel-major vs interleaved cut (+ de-interleave) at the
             bench shape (K=4096, L=96, 512x1392 padded)
  exact    — bit-exactness of interleaved cut + de-interleave vs the
             channel-major cut on random data
Usage: python experiments/exp_r4_interleave.py [cut|exact ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

P = 128


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def make(l=96, hp=512, wp=1408, k=4096, seed=0):
    rng = np.random.default_rng(seed)
    planes = jnp.asarray(rng.normal(size=(l, 3, hp, wp)).astype(np.float32))
    # interleaved: (L, Hp, 3*Wp), lane = 3*x + ch
    inter = jnp.reshape(jnp.swapaxes(planes, 1, 3), (l, hp, 3 * wp))
    # NOTE inter above is x-major? build properly below in exact phase; for
    # timing only the shape matters.
    lvl = jnp.asarray(rng.integers(0, l, k).astype(np.int32))
    y0 = jnp.asarray(rng.integers(0, hp - P, k).astype(np.int32))
    x0 = jnp.asarray(rng.integers(0, wp - P, k).astype(np.int32))
    return planes, inter, lvl, y0, x0


@jax.jit
def cut_major(planes, lvl, y0, x0):
    def one(l, y, x):
        zero = jnp.zeros((), l.dtype)
        return jax.lax.dynamic_slice(planes, (l, zero, y, x), (1, 3, P, P))[0]

    return jax.vmap(one)(lvl, y0, x0)


@jax.jit
def cut_inter(inter, lvl, y0, x0):
    def one(l, y, x):
        return jax.lax.dynamic_slice(inter, (l, y, 3 * x), (1, P, 3 * P))[0]

    return jax.vmap(one)(lvl, y0, x0)


@jax.jit
def cut_inter_deint(inter, lvl, y0, x0):
    raw = cut_inter(inter, lvl, y0, x0)  # (K, P, 3P), lane = 3*dx + ch
    return jnp.swapaxes(raw.reshape(-1, P, P, 3), 1, 3).swapaxes(2, 3)


def main():
    phases = sys.argv[1:] or ["cut", "exact"]
    if "exact" in phases:
        rng = np.random.default_rng(1)
        l, hp, wp, k = 4, 256, 256, 64
        planes_h = rng.normal(size=(l, 3, hp, wp)).astype(np.float32)
        # lane = 3*x + ch
        inter_h = np.zeros((l, hp, 3 * wp), np.float32)
        for ch in range(3):
            inter_h[:, :, ch::3] = planes_h[:, ch]
        lvl = rng.integers(0, l, k).astype(np.int32)
        y0 = rng.integers(0, hp - P, k).astype(np.int32)
        x0 = rng.integers(0, wp - P, k).astype(np.int32)
        a = np.asarray(cut_major(jnp.asarray(planes_h), *map(jnp.asarray, (lvl, y0, x0))))
        b = np.asarray(
            cut_inter_deint(jnp.asarray(inter_h), *map(jnp.asarray, (lvl, y0, x0)))
        )
        assert a.shape == b.shape, (a.shape, b.shape)
        exact = np.array_equal(a, b)
        print(f"exact: bit-equal={exact}")
        assert exact
    if "cut" in phases:
        planes, inter, lvl, y0, x0 = make()
        t_major = timeit(cut_major, planes, lvl, y0, x0)
        t_inter = timeit(cut_inter, inter, lvl, y0, x0)
        t_deint = timeit(cut_inter_deint, inter, lvl, y0, x0)
        print(
            f"cut channel-major: {t_major:.2f} ms | interleaved: "
            f"{t_inter:.2f} ms | +de-interleave: {t_deint:.2f} ms"
        )


if __name__ == "__main__":
    main()
