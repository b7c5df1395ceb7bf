"""Bisect the Mosaic compile failure in the selection kernels."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_TOTAL = 512
NS = 1280
PH = 136
PW = 128
L = 16
HMAX, WMAX = 544, 1408
G = 8


def make_inputs(align_x=False, seed=0):
    rng = np.random.default_rng(seed)
    planes = jnp.asarray(rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K_TOTAL), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, HMAX - PH, K_TOTAL), jnp.int32)
    x0 = rng.integers(0, WMAX - PW, K_TOTAL)
    if align_x:
        x0 = x0 & ~127
    x0 = jnp.asarray(x0, jnp.int32)
    rel_y = jnp.asarray(rng.integers(0, PH, (K_TOTAL, NS)), jnp.int32)
    rel_x = jnp.asarray(rng.integers(0, PW, (K_TOTAL, NS)), jnp.int32)
    return planes, lvl, y0, x0, rel_y, rel_x


def _make_runner(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K_TOTAL // G,),
        in_specs=[
            pl.BlockSpec((G, NS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (G, 3 * NS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((G, 3, PH, PW), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )

    def run(planes, lvl, y0, x0, rel_y, rel_x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K_TOTAL, 3 * NS), jnp.float32),
            grid_spec=grid_spec,
        )(lvl, y0, x0, rel_y, rel_x, planes)

    return run


def _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, i, g):
    return pltpu.make_async_copy(
        planes_ref.at[lvl_ref[i], :, pl.ds(y0_ref[i], PH), pl.ds(x0_ref[i], PW)],
        patch.at[g],
        sem.at[g],
    )


def k_dma_only(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
               out_ref, patch, sem):
    base = pl.program_id(0) * G
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).start()
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).wait()
        s = jnp.sum(patch[g])
        out_ref[g] = jnp.full((3 * NS,), s, jnp.float32)


def k_matmul_static(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                    out_ref, patch, sem):
    """bf16 matmul with a STATIC one-hot; DMA included."""
    base = pl.program_id(0) * G
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).start()
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (PW, NS), 0)
    oh = (iota_w == (jax.lax.broadcasted_iota(jnp.int32, (PW, NS), 1) % PW)).astype(
        jnp.bfloat16
    )
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).wait()
        p = patch[g]
        stacked = jnp.concatenate(
            [p.astype(jnp.bfloat16)] * 3, axis=0
        ).reshape(9 * PH, PW)
        t = jax.lax.dot_general(
            stacked, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[g] = jnp.sum(t.reshape(9, PH, NS), axis=(0, 1)).reshape(NS).repeat(3)


def k_matmul_dyn_oh(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                    out_ref, patch, sem):
    """bf16 matmul with DYNAMIC one-hot from prefetched rel_x."""
    base = pl.program_id(0) * G
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).start()
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (PW, NS), 0)
    for g in range(G):
        oh = (iota_w == relx_ref[g][None, :]).astype(jnp.bfloat16)
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).wait()
        p = patch[g]
        stacked = jnp.concatenate(
            [p.astype(jnp.bfloat16)] * 3, axis=0
        ).reshape(9 * PH, PW)
        t = jax.lax.dot_general(
            stacked, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[g] = jnp.sum(t.reshape(9, PH, NS), axis=(0, 1)).reshape(NS).repeat(3)


def k_split_nomm(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                 out_ref, patch, sem):
    """bf16 split chain + VPU reduce, NO matmul."""
    base = pl.program_id(0) * G
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).start()
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).wait()
        p = patch[g]
        p1 = p.astype(jnp.bfloat16)
        r1 = p - p1.astype(jnp.float32)
        p2 = r1.astype(jnp.bfloat16)
        p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
        s = (
            jnp.sum(p1.astype(jnp.float32))
            + jnp.sum(p2.astype(jnp.float32))
            + jnp.sum(p3.astype(jnp.float32))
        )
        out_ref[g] = jnp.full((3 * NS,), s, jnp.float32)


def k_vpu_rowstage(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                   out_ref, patch, sem):
    """The (3,3,PH,NS)-shaped VPU reduce stage alone (t faked from patch)."""
    base = pl.program_id(0) * G
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (PH, NS), 0)
    for g in range(G):
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).start()
    for g in range(G):
        ohr_t = (iota_h == rely_ref[g][None, :]).astype(jnp.float32)
        _dma(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base + g, g).wait()
        t = jnp.broadcast_to(patch[g][:, :, :1], (3, PH, NS))
        v = jnp.sum(t * ohr_t[None, :, :], axis=1)  # (3, NS)
        out_ref[g] = v.reshape(3 * NS)


def main():
    print("devices:", jax.devices())
    for align in (False, True):
        inputs = make_inputs(align_x=align)
        for name, kern in [
            ("dma_only", k_dma_only),
            ("matmul_static_oh", k_matmul_static),
            ("matmul_dyn_oh", k_matmul_dyn_oh),
            ("split_no_matmul", k_split_nomm),
            ("vpu_rowstage", k_vpu_rowstage),
        ]:
            try:
                jfn = jax.jit(_make_runner(kern))
                out = jfn(*inputs)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(10):
                    out = jfn(*inputs)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / 10 * 1e3
                print(f"align_x={align} {name}: OK {ms:.2f} ms ({K_TOTAL} kp)")
            except Exception as e:
                msg = str(e).replace("\n", " ")[:160]
                print(f"align_x={align} {name}: FAILED {type(e).__name__}: {msg}")
        if not align:
            print("---")


if __name__ == "__main__":
    main()
