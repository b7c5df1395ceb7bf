"""Round-3 verify scenario: drive the changed paths through cv_tpu public
imports on the real TPU (verify skill recipe).

Covers: device AKAZE extract (pgather selection + de-scattered dedup +
re-tiled refine gathers) on the KITTI goldens, Hamming matching
(distance_matrix re-tile), the pose pipeline (11 inliers), and an engine
end-to-end mini-run with similar-frame retrieval (descriptor rerank path).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

failures = []


def check(name, cond, detail=""):
    status = "ok" if cond else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not cond:
        failures.append(name)


# 1. KITTI goldens through the public extractor (batched device path).
from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze.fast import DeviceExtractor, FastAkazeExtractor
from cv_tpu.matching import lowes_ratio_matches

img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)
ex = DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
t0 = time.time()
fs = ex.extract(batch)
counts = np.asarray(fs.count)
print(f"extract compile+run {time.time() - t0:.0f}s, mode={ex.onehot_mode}")
check("golden keypoint counts", counts[0] == 399 and counts[1] == 343, counts[:2])

# Matching through the public API (re-tiled distance_matrix).
w0 = fs.words[0][fs.valid[0]]
w14 = fs.words[1][fs.valid[1]]
idx, keep = lowes_ratio_matches(w0, w14, 0.5)
n_matches = int(np.asarray(jnp.sum(keep)))
check("golden match count", n_matches == 11, n_matches)

# 2. Pose pipeline (bench config): 11 inliers via public consensus/solvers.
import bench

ms, inl = bench._bench_pose_pipeline()
check("pose pipeline inliers", inl == 11, f"{inl} ({ms:.1f} ms)")

# 3. Engine end-to-end mini-run with retrieval rerank active.
from cv_tpu.apps.synth import render_sequence
from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
from cv_tpu.sfm import VSlam, VSlamSettings

images, (fx, fy, cx, cy), _ = render_sequence(
    n_frames=8, height=384, width=512, n_points=800, seed=1
)
settings = VSlamSettings(
    akaze_threshold=0.001,
    tracking_features=1024,
    two_view_minimum_robust_matches=32,
    optimization_iterations=128,
    three_view_patience=2000,
    single_view_patience=2000,
    constraint_patience=500,
    tracking_recent_frames=4,
    tracking_similar_frames=2,  # exercise sketch retrieval + rerank
)
engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
intr = CameraIntrinsicsK1Distortion.new(
    CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
)
feed = engine.add_feed(intr)
t0 = time.time()
for img in images:
    engine.add_frame(feed, img)
dt = time.time() - t0
views = max((len(r.views) for r in engine.data.reconstructions.values()), default=0)
lms = max((len(r.landmarks) for r in engine.data.reconstructions.values()), default=0)
check("engine builds a reconstruction", views >= 6, f"{views} views, {lms} landmarks, {dt:.0f}s")
errors = []
for rk in engine.data.reconstructions:
    errors += engine.sanity_check(rk)
check("sanity_check clean", not errors, errors[:3])

print("FAILURES:" if failures else "ALL OK:", failures or "verified")
sys.exit(1 if failures else 0)
