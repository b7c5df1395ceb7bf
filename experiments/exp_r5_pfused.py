"""Round-5: device verdict on the single-pass fused describe ('pfused').

Phase 'trig': does Mosaic's atan2/cos/sin bit-match XLA's TPU lowering?
(If not, the in-kernel angle can produce different near-tie descriptor
bits than the XLA paths, and 'pfused' cannot be golden-gated.)
Phase 'extract': composed extract A/B vs 'pgather' at the bench shape,
with goldens + valid-word equality.

Usage: python experiments/exp_r5_pfused.py [trig] [extract]
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


def phase_trig():
    def body(x_ref, o_ref):
        x = x_ref[...]
        o_ref[0] = jnp.arctan2(x[0], x[1])
        o_ref[1] = jnp.cos(x[0])
        o_ref[2] = jnp.sin(x[0])
        o_ref[3] = jnp.mod(x[0] + jnp.float32(2.0 * np.pi), jnp.float32(2.0 * np.pi))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-7, 7, (8, 128)).astype(np.float32))
    pall = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    got = np.asarray(pall(x))
    ref = np.stack(
        [
            np.asarray(jnp.arctan2(x[0], x[1])),
            np.asarray(jnp.cos(x[0])),
            np.asarray(jnp.sin(x[0])),
            np.asarray(jnp.mod(x[0] + jnp.float32(2.0 * np.pi), jnp.float32(2.0 * np.pi))),
        ]
    )
    for i, name in enumerate(["atan2", "cos", "sin", "mod"]):
        eq = np.array_equal(got[i], ref[i])
        md = float(np.abs(got[i] - ref[i]).max())
        print(f"trig {name:6s}: bit-equal={eq} maxdiff={md:.3e}", flush=True)


def phase_extract():
    from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor
    from cv_tpu.utils.fixtures import fixture_path

    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)
    outs = {}
    for mode in ("pgather", "pfused"):
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            onehot_mode=mode,
        )
        t0 = time.time()
        try:
            fs = ex.extract(batch)
            counts = np.asarray(fs.count)[:2].tolist()
        except Exception as e:
            print(f"extract {mode}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(5):
                out = ex.extract(batch)
            np.asarray(out.count.ravel()[:1])
            best = min(best, (time.perf_counter() - t1) / 5)
        outs[mode] = fs
        print(
            f"extract B=8 {mode:8s}: {best*1e3:7.1f} ms/batch = {8/best:5.0f} fps"
            f" | goldens {counts} {'OK' if counts == [399, 343] else 'FAIL'}"
            f" (first {time.time()-t0:.0f}s)",
            flush=True,
        )
    if len(outs) == 2:
        va = np.asarray(outs["pgather"].valid)
        eq_v = np.array_equal(va, np.asarray(outs["pfused"].valid))
        eq_w = np.array_equal(
            np.asarray(outs["pgather"].words)[va],
            np.asarray(outs["pfused"].words)[va],
        )
        eq_a = np.array_equal(
            np.asarray(outs["pgather"].angle)[va],
            np.asarray(outs["pfused"].angle)[va],
        )
        print(f"valid-equal={eq_v} words-equal={eq_w} angle-equal={eq_a}", flush=True)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["trig", "extract"]
    if "trig" in phases:
        phase_trig()
    if "extract" in phases:
        phase_extract()
