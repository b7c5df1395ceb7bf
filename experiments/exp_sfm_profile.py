"""Profile the SfM end-to-end bench: cumulative time per engine phase.

Wraps the hot engine methods with wall timers and counts device dispatches
(via a monkey-patched jax counter is unreliable; we count np.asarray/
device_get transfer sites per phase with timers instead).
"""

import cProfile
import io
import pstats
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.apps.synth import render_sequence
    from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
    from cv_tpu.sfm import VSlam, VSlamSettings

    images, (fx, fy, cx, cy), _ = render_sequence(
        n_frames=12, height=512, width=640, n_points=900, seed=0
    )
    settings = VSlamSettings(
        akaze_threshold=0.001,
        tracking_features=1024,
        two_view_minimum_robust_matches=32,
        optimization_iterations=256,
        three_view_patience=4000,
        single_view_patience=4000,
        constraint_patience=1000,
        tracking_recent_frames=8,
    )
    engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
    intr = CameraIntrinsicsK1Distortion.new(
        CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
    )
    feed = engine.add_feed(intr)
    engine.kps_descriptors(intr, images[0])  # warm extractor compile

    # phase timers around key engine methods
    phases = {}

    def wrap(obj, name):
        orig = getattr(obj, name)

        def timed(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
            return out

        setattr(obj, name, timed)

    for m in [
        "kps_descriptors", "try_localize", "init_reconstruction",
        "init_two_view", "register_frame", "incorporate_frame",
        "optimize_reconstruction", "apply_constraints",
        "filter_non_robust_observations", "generate_view_constraints",
        "record_view_constraints", "symmetric_matching",
        "_single_view_consensus", "_register_refine_device",
        "_robust_points_batch", "try_merge_reconstructions",
    ]:
        if hasattr(engine, m):
            wrap(engine, m)

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    for img in images:
        engine.add_frame(feed, img)
    pr.disable()
    dt = time.time() - t0
    print(f"total {dt:.1f}s for 12 frames -> {12/dt:.2f} fps")
    total = sum(phases.values())
    for name, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {name:38s} {v:7.2f}s")
    print(f"  (nested phases double-count; top-level sum {total:.1f})")

    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(30)
    print(s.getvalue()[:4500])





def warm_main():
    """Second-pass (steady-state) profile with fetch-site accounting."""
    import cv_tpu.sfm.engine as eng
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.apps.synth import render_sequence
    from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
    from cv_tpu.sfm import VSlam, VSlamSettings
    from cv_tpu.akaze import Akaze

    images, (fx, fy, cx, cy), _ = render_sequence(
        n_frames=12, height=512, width=640, n_points=900, seed=0
    )
    settings = VSlamSettings(
        akaze_threshold=0.001,
        tracking_features=1024,
        two_view_minimum_robust_matches=32,
        optimization_iterations=256,
        three_view_patience=4000,
        single_view_patience=4000,
        constraint_patience=1000,
        tracking_recent_frames=8,
    )
    intr = CameraIntrinsicsK1Distortion.new(
        CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
    )
    extractor = FastAkazeExtractor(
        Akaze(detector_threshold=settings.akaze_threshold,
              maximum_features=settings.tracking_features)
    )

    stats = {"fetch_calls": 0, "fetch_s": 0.0, "fetch_arrays": 0}
    orig_fetch = eng._fetch

    def counting_fetch(*arrays):
        t0 = time.perf_counter()
        out = orig_fetch(*arrays)
        stats["fetch_calls"] += 1
        stats["fetch_arrays"] += len(arrays)
        stats["fetch_s"] += time.perf_counter() - t0
        return out

    def run():
        engine = VSlam(settings=settings, seed=0,
                       extractor_cls=lambda *a, **k: extractor)
        feed = engine.add_feed(intr)
        t0 = time.time()
        # Same pipelined frontend as bench._bench_sfm_end_to_end.
        token = engine.prefetch_extract(feed, images[0])
        for nxt in images[1:]:
            nxt_token = engine.prefetch_extract(feed, nxt)
            engine.add_frame(feed, token)
            token = nxt_token
        engine.add_frame(feed, token)
        return time.time() - t0, engine

    run()  # compile pass
    eng._fetch = counting_fetch
    try:
        import cProfile, io, pstats

        pr = cProfile.Profile()
        pr.enable()
        dt, engine = run()
        pr.disable()
    finally:
        eng._fetch = orig_fetch
    print(f"warm pass: {dt:.1f}s for 12 frames -> {12/dt:.2f} fps")
    print(f"_fetch: {stats['fetch_calls']} calls ({stats['fetch_calls']/12:.0f}/frame), "
          f"{stats['fetch_arrays']} arrays, {stats['fetch_s']:.1f}s waiting "
          f"({stats['fetch_s']/dt*100:.0f}% of wall)")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(24)
    ps.print_callers("array.py.*_value")
    print(s.getvalue()[:6000])


if __name__ == "__main__":
    import sys as _sys

    warm_main() if "warm" in _sys.argv else main()
