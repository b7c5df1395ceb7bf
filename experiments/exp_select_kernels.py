"""TPU experiments for the descriptor sample-selection kernel redesign.

Strategies measured on the real chip for replacing the orient_mldb one-hot
einsum (the extractor's 33 ms ceiling), G=8 keypoints per grid step:

  A. bf16x3 M-stacked matmul selection (bit-exact split)
  B. int8x4 bitcast byte-plane selection (2x MXU peak, exact by construction)
  C. in-kernel take_along_axis probe
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_TOTAL = 4096
NS = 1280
PH = 136
PW = 128
L = 16
HMAX, WMAX = 544, 1408
G = 8  # keypoints per grid step


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    planes = jnp.asarray(rng.normal(size=(L, 3, HMAX, WMAX)).astype(np.float32))
    lvl = jnp.asarray(rng.integers(0, L, K_TOTAL), jnp.int32)
    y0 = jnp.asarray(rng.integers(0, HMAX - PH, K_TOTAL), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, WMAX - PW, K_TOTAL), jnp.int32)
    rel_y = jnp.asarray(rng.integers(0, PH, (K_TOTAL, NS)), jnp.int32)
    rel_x = jnp.asarray(rng.integers(0, PW, (K_TOTAL, NS)), jnp.int32)
    return planes, lvl, y0, x0, rel_y, rel_x


def _start_dmas(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base):
    dmas = []
    for g in range(G):
        i = base + g
        d = pltpu.make_async_copy(
            planes_ref.at[lvl_ref[i], :, pl.ds(y0_ref[i], PH), pl.ds(x0_ref[i], PW)],
            patch.at[g],
            sem.at[g],
        )
        d.start()
        dmas.append(d)
    return dmas


def _make_runner(kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K_TOTAL // G,),
        in_specs=[
            pl.BlockSpec((G, NS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, NS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
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


def _kernel_bf16(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                 out_ref, patch, sem):
    base = pl.program_id(0) * G
    _start_dmas(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (PW, NS), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (PH, NS), 0)
    for g in range(G):
        ohc_t = (iota_w == relx_ref[g][None, :]).astype(jnp.bfloat16)  # (PW, NS)
        ohr_t = (iota_h == rely_ref[g][None, :]).astype(jnp.float32)   # (PH, NS)
        pltpu.make_async_copy(
            planes_ref.at[lvl_ref[base + g], :, pl.ds(y0_ref[base + g], PH),
                          pl.ds(x0_ref[base + g], PW)],
            patch.at[g],
            sem.at[g],
        ).wait()
        p = patch[g]
        p1 = p.astype(jnp.bfloat16)
        r1 = p - p1.astype(jnp.float32)
        p2 = r1.astype(jnp.bfloat16)
        p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
        stacked = jnp.concatenate([p1, p2, p3], axis=0).reshape(9 * PH, PW)
        t = jax.lax.dot_general(
            stacked, ohc_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(3, 3, PH, NS)
        v = jnp.sum(jnp.sum(t, axis=1) * ohr_t[None, :, :], axis=1)  # (3, NS)
        out_ref[g] = v.reshape(3 * NS)


def _kernel_int8(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                 out_ref, patch, sem):
    base = pl.program_id(0) * G
    _start_dmas(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (PW, NS), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (PH, NS), 0)
    for g in range(G):
        ohc_t = (iota_w == relx_ref[g][None, :]).astype(jnp.int8)   # (PW, NS)
        ohr_t = (iota_h == rely_ref[g][None, :]).astype(jnp.int32)  # (PH, NS)
        pltpu.make_async_copy(
            planes_ref.at[lvl_ref[base + g], :, pl.ds(y0_ref[base + g], PH),
                          pl.ds(x0_ref[base + g], PW)],
            patch.at[g],
            sem.at[g],
        ).wait()
        bits = pltpu.bitcast(patch[g], jnp.int32)
        b0 = (bits & 0xFF).astype(jnp.int8)
        b1 = ((bits >> 8) & 0xFF).astype(jnp.int8)
        b2 = ((bits >> 16) & 0xFF).astype(jnp.int8)
        b3 = ((bits >> 24) & 0xFF).astype(jnp.int8)
        stacked = jnp.concatenate([b0, b1, b2, b3], axis=0).reshape(12 * PH, PW)
        t = jax.lax.dot_general(
            stacked, ohc_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(4, 3, PH, NS)
        sel = jnp.sum(t * ohr_t[None, None, :, :], axis=2)
        word = (
            (sel[0] & 0xFF)
            | ((sel[1] & 0xFF) << 8)
            | ((sel[2] & 0xFF) << 16)
            | ((sel[3] & 0xFF) << 24)
        )
        out_ref[g] = pltpu.bitcast(word, jnp.float32).reshape(3 * NS)


def _kernel_taa(lvl_ref, y0_ref, x0_ref, rely_ref, relx_ref, planes_ref,
                out_ref, patch, sem):
    base = pl.program_id(0) * G
    _start_dmas(lvl_ref, y0_ref, x0_ref, planes_ref, patch, sem, base)
    for g in range(G):
        pltpu.make_async_copy(
            planes_ref.at[lvl_ref[base + g], :, pl.ds(y0_ref[base + g], PH),
                          pl.ds(x0_ref[base + g], PW)],
            patch.at[g],
            sem.at[g],
        ).wait()
        rely = rely_ref[g]
        relx = relx_ref[g]
        for ch in range(3):
            p2 = patch[g, ch]  # (PH, PW)
            rows = jnp.take(p2, rely, axis=0)  # (NS, PW) 2D gather
            vals = jnp.take_along_axis(rows, relx[:, None], axis=1)  # (NS, 1)
            out_ref[g, pl.ds(ch * NS, NS)] = vals[:, 0]


def host_reference(planes, lvl, y0, x0, rel_y, rel_x, k_check=64):
    p = np.asarray(planes)
    out = np.zeros((k_check, 3, NS), np.float32)
    for i in range(k_check):
        patch = p[int(lvl[i]), :, int(y0[i]): int(y0[i]) + PH,
                  int(x0[i]): int(x0[i]) + PW]
        out[i] = patch[:, np.asarray(rel_y[i]), np.asarray(rel_x[i])]
    return out


def main():
    print("devices:", jax.devices())
    inputs = make_inputs()
    ref = host_reference(*inputs)
    for name, kern in [("bf16x3", _kernel_bf16), ("int8x4", _kernel_int8),
                       ("take_along_axis", _kernel_taa)]:
        try:
            jfn = jax.jit(_make_runner(kern))
            ms, out = timeit(jfn, *inputs)
            got = np.asarray(out[: ref.shape[0]]).reshape(ref.shape[0], 3, NS)
            exact = np.array_equal(got, ref)
            print(f"{name}: {ms:.2f} ms for {K_TOTAL} kp, bit-exact={exact}")
            if not exact:
                print(f"   mismatches: {np.sum(got != ref)} / {ref.size}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
