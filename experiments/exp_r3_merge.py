"""Round-3: a revisit that triggers a reconstruction MERGE on the real
engine path (LSH retrieval + rerank -> try_merge_reconstructions).

Builds two disjoint segments of one scene (recency window too small to
bridge the gap) so two reconstructions form, then feeds bridge frames that
overlap both; the engine must retrieve the old segment via the sketch
shortlist + descriptor rerank and merge the reconstructions.

Usage: python experiments/exp_r3_merge.py [n_per_segment]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np

sys.path.insert(0, "/root/repo")


def run(n_seg=6, verbose=True):
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.apps.synth import render_sequence
    from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
    from cv_tpu.sfm import VSlam, VSlamSettings

    gap = int(2.7 * n_seg)
    n_total = n_seg + gap + n_seg
    images, (fx, fy, cx, cy), _ = render_sequence(
        n_frames=n_total, height=512, width=640, n_points=1200, seed=5
    )
    # Segment A: frames [0, n_seg); segment B: the far end of the
    # trajectory (viewpoint change too wide for cross-segment
    # registration); bridge: mid-trajectory frames, fed LAST.
    seg_a = list(range(0, n_seg))
    seg_b = list(range(n_seg + gap, n_total))
    mid = n_seg + gap // 2
    bridge = [mid - 1, mid, mid + 1, mid + 2]
    order = seg_a + seg_b + bridge

    settings = VSlamSettings(
        akaze_threshold=0.001,
        tracking_features=1024,
        two_view_minimum_robust_matches=32,
        optimization_iterations=256,
        three_view_patience=4000,
        single_view_patience=4000,
        constraint_patience=1000,
        tracking_recent_frames=3,  # too small to bridge the segment gap
        tracking_similar_frames=6,  # wide enough to span BOTH segments
        tracking_similar_frame_recent_threshold=3,
        tracking_similar_frame_search_num=64,
    )
    engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
    intr = CameraIntrinsicsK1Distortion.new(
        CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
    )
    feed = engine.add_feed(intr)
    recs_per_step = []
    t0 = time.time()
    for i in order:
        engine.add_frame(feed, images[i])
        n_recs = len(engine.data.reconstructions)
        views = [len(r.views) for r in engine.data.reconstructions.values()]
        recs_per_step.append((i, n_recs, views))
        if verbose:
            print(f"frame {i}: {n_recs} reconstructions, views {views}", flush=True)
    dt = time.time() - t0
    max_recs = max(n for _, n, _ in recs_per_step)
    final_recs = recs_per_step[-1][1]
    final_views = max(recs_per_step[-1][2], default=0)
    merged = max_recs >= 2 and final_recs < max_recs
    print(
        f"merge scenario: {dt:.0f}s, max {max_recs} recs -> final {final_recs} "
        f"({final_views} views) merged={merged}", flush=True,
    )
    return merged, max_recs, final_recs, final_views


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    run(n)
