"""Round-3: run the engine at REFERENCE-SCALE settings over a long sequence.

VSlamSettings() defaults mirror the reference's settings.rs (tracking
features 8192, two-view floor 256 inliers, optimization_iterations 1024,
full patience values).  Rounds 1-2 only ever exercised scaled-down
configurations; this runs the default-settings engine over a >= 50-frame
rendered sequence on the TPU and records per-frame latency, reconstruction
growth, and sanity_check results.

Usage: python experiments/exp_r3_refscale.py [n_frames] [out_md]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

sys.path.insert(0, "/root/repo")


def main(n_frames=64, out_md=None):
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.apps.synth import render_sequence
    from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
    from cv_tpu.sfm import VSlam, VSlamSettings

    images, (fx, fy, cx, cy), _ = render_sequence(
        n_frames=n_frames, height=512, width=640, n_points=2200, seed=3
    )
    settings = VSlamSettings()  # REFERENCE defaults: 8192 features, 256 floor
    engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
    intr = CameraIntrinsicsK1Distortion.new(
        CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
    )
    feed = engine.add_feed(intr)

    lines = [
        "# Reference-scale engine run (round 3)",
        "",
        f"{n_frames} rendered frames 512x640, VSlamSettings() defaults "
        "(tracking_features 8192, two_view floor 256, optimization_iterations "
        "1024 — settings.rs parity), FastAkazeExtractor, real TPU.",
        "",
        "| frame | s | features | recs | views(max) | landmarks(max) |",
        "|---|---|---|---|---|---|",
    ]
    t_all = time.time()
    for i, img in enumerate(images):
        t0 = time.time()
        f = engine.add_frame(feed, img)
        dt = time.time() - t0
        views = max((len(r.views) for r in engine.data.reconstructions.values()), default=0)
        lms = max((len(r.landmarks) for r in engine.data.reconstructions.values()), default=0)
        nfeat = len(engine.data.frames[f].descriptors)
        row = (
            f"| {i} | {dt:.2f} | {nfeat} | "
            f"{len(engine.data.reconstructions)} | {views} | {lms} |"
        )
        lines.append(row)
        print(row, flush=True)
    total = time.time() - t_all

    lines.append("")
    lines.append(f"Total {total:.1f} s -> {n_frames / total:.3f} fps (includes compile).")
    for rk, rec in engine.data.reconstructions.items():
        errors = engine.sanity_check(rk)
        lines.append(
            f"- reconstruction {rk}: {len(rec.views)} views, "
            f"{len(rec.landmarks)} landmarks, sanity errors: {len(errors)}"
        )
        print(lines[-1], flush=True)
    if out_md:
        with open(out_md, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", out_md)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out = sys.argv[2] if len(sys.argv) > 2 else None
    main(n, out)
