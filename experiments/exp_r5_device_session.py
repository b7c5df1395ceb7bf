"""Round-5 device session: B=16 flagship probe + SfM steady state w/ async.

Phases (argv): 'b16' — does removing the patch buffer (pgroups) unlock
B=16 batching (round-3: B=16 lost to B=8 on HBM pressure from plane stack
+ 805 MB patch buffer)?  'sfm' — bench's 12-frame steady state with
settings.async_optimize on vs off (r4-tpu-queue item 6; r4 record 2.51 fps).

Usage: python experiments/exp_r5_device_session.py [b16] [sfm]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def phase_b16():
    from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
    from cv_tpu.akaze.fast import DeviceExtractor
    from cv_tpu.utils.fixtures import fixture_path

    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    for batch_n, mode in ((16, "pgroups"), (16, "pgather"), (12, "pgather"), (12, "pgroups")):
        batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * (batch_n // 2))
        ex = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=512,
            onehot_mode=mode,
        )
        t0 = time.time()
        fs = ex.extract(batch)
        counts = np.asarray(fs.count)[:2].tolist()
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(5):
                out = ex.extract(batch)
            np.asarray(out.count.ravel()[:1])
            best = min(best, (time.perf_counter() - t1) / 5)
        print(
            f"extract B={batch_n} {mode:8s}: {best*1e3:7.1f} ms/batch = "
            f"{batch_n/best:5.0f} fps | goldens {counts} "
            f"{'OK' if counts == [399, 343] else 'FAIL'} "
            f"(first {time.time()-t0:.0f}s)",
            flush=True,
        )


def phase_sfm():
    import dataclasses

    import bench
    from cv_tpu.sfm import settings as settings_mod

    # async on (the new default)
    t0 = time.time()
    fps, views, landmarks = bench._bench_sfm_end_to_end()
    print(
        f"sfm async=on : {fps:.2f} fps ({views} views, {landmarks} landmarks; "
        f"wall {time.time()-t0:.0f}s)",
        flush=True,
    )
    # async off for the A/B
    orig = settings_mod.VSlamSettings.__init__

    field = "async_optimize"
    old_default = settings_mod.VSlamSettings.__dataclass_fields__[field].default

    def patched(self, *a, **k):
        k.setdefault(field, False)
        orig(self, *a, **k)

    settings_mod.VSlamSettings.__init__ = patched
    try:
        t0 = time.time()
        fps, views, landmarks = bench._bench_sfm_end_to_end()
        print(
            f"sfm async=off: {fps:.2f} fps ({views} views, {landmarks} "
            f"landmarks; wall {time.time()-t0:.0f}s)",
            flush=True,
        )
    finally:
        settings_mod.VSlamSettings.__init__ = orig


if __name__ == "__main__":
    phases = sys.argv[1:] or ["b16", "sfm"]
    if "b16" in phases:
        phase_b16()
    if "sfm" in phases:
        phase_sfm()
