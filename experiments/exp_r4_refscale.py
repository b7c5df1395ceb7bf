"""Round-4: reference-scale run v2 — UNCAPPED 8192-feature device extractor.

Round 3's run (docs/refscale-run.md) was silently bounded at 2048 features
by FastAkazeExtractor's old cap and a 2200-point scene; the cap is lifted
(fast.py honors config.maximum_features, settings.rs:469-471 parity) and the
scene is dense enough to saturate the 8192 budget.  Records per-frame
latency, the feature ladder, reconstruction growth, and sanity; writes
docs/refscale-run-v2.md.

Spike forensics: per-frame latency spikes in v1 (frame 43: 53.7 s at 24
features) track FIRST HITS of new bucket shapes (the engine bucket-pads
every device program's inputs; each new (match-count, landmark) bucket pays
one compile, persistent-cached).  This run logs the engine's bucket ladder
per frame so spikes are attributable instead of mysterious.

Usage: python experiments/exp_r4_refscale.py [n_frames] [out_md]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

sys.path.insert(0, "/root/repo")


def main(n_frames=56, out_md="docs/refscale-run-v2.md"):
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.apps.synth import render_sequence
    from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
    from cv_tpu.sfm import VSlam, VSlamSettings
    from cv_tpu.sfm import engine as engine_mod

    # Dense star field so the extractor can actually reach the 8192 budget.
    images, (fx, fy, cx, cy), _ = render_sequence(
        n_frames=n_frames, height=512, width=640, n_points=9000, seed=3
    )
    settings = VSlamSettings()  # REFERENCE defaults: 8192 features, 256 floor
    engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
    intr = CameraIntrinsicsK1Distortion.new(
        CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
    )
    feed = engine.add_feed(intr)

    # Bucket-ladder forensics: record every NEW bucket size the engine pads
    # to, per frame (new buckets => fresh XLA programs => compile spikes).
    seen = set()
    orig_bucket = engine_mod._bucket

    def tracing_bucket(n, minimum=64):
        b = orig_bucket(n, minimum)
        seen.add(b)
        return b

    engine_mod._bucket = tracing_bucket

    lines = [
        "# Reference-scale engine run v2 (round 4, uncapped 8192 features)",
        "",
        f"{n_frames} rendered frames 512x640 (9000-point field), "
        "VSlamSettings() defaults (tracking_features 8192, two_view floor "
        "256, optimization_iterations 1024 — settings.rs parity), "
        "FastAkazeExtractor honoring maximum_features, real TPU.",
        "",
        "| frame | s | features | recs | views(max) | landmarks(max) | new buckets |",
        "|---|---|---|---|---|---|---|",
    ]
    t_all = time.time()
    for i, img in enumerate(images):
        before = set(seen)
        t0 = time.time()
        f = engine.add_frame(feed, img)
        dt = time.time() - t0
        views = max(
            (len(r.views) for r in engine.data.reconstructions.values()), default=0
        )
        lms = max(
            (len(r.landmarks) for r in engine.data.reconstructions.values()),
            default=0,
        )
        nfeat = len(engine.data.frames[f].descriptors)
        new_b = sorted(seen - before)
        row = (
            f"| {i} | {dt:.2f} | {nfeat} | "
            f"{len(engine.data.reconstructions)} | {views} | {lms} | "
            f"{new_b if new_b else ''} |"
        )
        lines.append(row)
        print(row, flush=True)
    total = time.time() - t_all

    lines.append("")
    lines.append(
        f"Total {total:.1f} s -> {n_frames / total:.3f} fps (includes compile)."
    )
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
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 56,
        sys.argv[2] if len(sys.argv) > 2 else "docs/refscale-run-v2.md",
    )
