"""Round-3: probe Mosaic dynamic-gather (tpu.dynamic_gather) for descriptor
sample selection.

Mosaic lowers jnp.take_along_axis ONLY when operand/indices/output shapes
are equal (2D).  Chained selection per keypoint channel:
  p4 = tile(patch, lanes -> NS)            # 128-aligned lane tiling, cheap
  u  = take_along_axis(p4, rx_b, axis=1)   # u[h, s] = patch[h, rx[s]]
  v  = take_along_axis(u, ry_b, axis=0)    # v[:, s] = u[ry[s], s]
All f32, no one-hot, no MXU — bit-exact by construction.

Phases: lane, sublane (micro), select (K=4096 full-shape kernel).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

K, G, P, NS, C = 4096, 8, 128, 512, 3


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    cs = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, cs, out


def phase_lane():
    def kern(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 512)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 512, (128, 512)).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        ms, cs, out = timeit(jax.jit(f), x, idx)
        ref = np.asarray(x)[np.arange(128)[:, None], np.asarray(idx)]
        print(f"lane gather: {ms:.3f} ms exact={np.array_equal(np.asarray(out), ref)}")
    except Exception as e:
        print(f"lane gather: FAILED {type(e).__name__}: {str(e)[:200]}")


def phase_sublane():
    def kern(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 512)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, (128, 512)).astype(np.int32))
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        ms, cs, out = timeit(jax.jit(f), x, idx)
        ref = np.asarray(x)[np.asarray(idx), np.arange(512)[None, :]]
        print(f"sublane gather: {ms:.3f} ms exact={np.array_equal(np.asarray(out), ref)}")
    except Exception as e:
        print(f"sublane gather: FAILED {type(e).__name__}: {str(e)[:200]}")


def _kern_select(relx_ref, rely_ref, patch_ref, out_ref):
    # Samples ride LANES everywhere (tables (G, NS), output (G, C, NS)),
    # so every broadcast below is sublane-replication: zero relayouts.
    for j in range(G):
        rx_b = jnp.broadcast_to(relx_ref[j][None, :], (P, NS))
        ry_b = jnp.broadcast_to(rely_ref[j][None, :], (P, NS))
        for ch in range(C):
            p = patch_ref[j, ch]  # (P, P)
            p4 = jnp.concatenate([p] * (NS // P), axis=1)  # (P, NS) lane tile
            u = jnp.take_along_axis(p4, rx_b, axis=1)  # u[h,s] = p[h, rx[s]]
            v = jnp.take_along_axis(u, ry_b, axis=0)  # v[:,s] = u[ry[s], s]
            out_ref[j, ch] = v[0]


def phase_select():
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(K, C, P, P)).astype(np.float32)
    rel_x = rng.integers(0, P, (K, NS)).astype(np.int32)
    rel_y = rng.integers(0, P, (K, NS)).astype(np.int32)
    f = pl.pallas_call(
        _kern_select,
        grid=(K // G,),
        in_specs=[
            pl.BlockSpec((G, NS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, C, P, P), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, C, NS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, C, NS), jnp.float32),
    )
    try:
        ms, cs, out = timeit(
            jax.jit(f), jnp.asarray(rel_x), jnp.asarray(rel_y), jnp.asarray(patches)
        )
        o = np.asarray(out[:4])
        ref = patches[
            np.arange(4)[:, None, None],
            np.arange(C)[None, :, None],
            rel_y[:4][:, None, :],
            rel_x[:4][:, None, :],
        ]
        print(
            f"select 2-gather: {ms:.2f} ms (compile {cs:.0f}s) "
            f"-> {ms / K * 1e3:.2f} us/kp exact={np.array_equal(o, ref)}"
        )
    except Exception as e:
        print(f"select 2-gather: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["lane", "sublane", "select"]
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        {"lane": phase_lane, "sublane": phase_sublane, "select": phase_select}[nm]()
