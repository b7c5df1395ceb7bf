"""Driver benchmark: AKAZE extract + match throughput on the KITTI pair.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is frames/sec/chip for the fully-device batched AKAZE extraction
(cv_tpu.akaze.fast.DeviceExtractor) plus brute-force Hamming matching of
consecutive frames — the BASELINE.json north-star workload.  The baseline
target is 1000 fps/chip, so vs_baseline = fps / 1000.

Correctness gate: the run only counts if the extractor reproduces the
reference goldens (399/343 keypoints) on the KITTI pair.
"""

import json
import time
import warnings

warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
import numpy as np

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze.fast import DeviceExtractor
from cv_tpu.matching import distance_matrix

BATCH = 8
TIMED_ITERS = 5
BASELINE_FPS = 1000.0


def main():
    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * (BATCH // 2))

    extractor = DeviceExtractor(
        Akaze.sparse(), candidate_budget=256, max_features=512
    )

    @jax.jit
    def extract_and_match(images):
        fs = extractor.extract(images)
        # Match consecutive frames (0-1, 2-3, ...): Hamming distance matrix +
        # 2-NN Lowes gate, masked by validity.
        words = fs.words.reshape(BATCH // 2, 2, -1, 16)
        valid = fs.valid.reshape(BATCH // 2, 2, -1)

        def match_pair(w, v):
            d = distance_matrix(w[0], w[1])
            d = jnp.where(v[0][:, None] & v[1][None, :], d, 10_000)
            neg, idx = jax.lax.top_k(-d, 2)
            d0, d1 = -neg[:, 0], -neg[:, 1]
            keep = d0.astype(jnp.float32) < d1.astype(jnp.float32) * 0.5
            return idx[:, 0], keep & v[0]

        idx, keep = jax.vmap(match_pair)(words, valid)
        return fs.count, jnp.sum(keep, axis=-1), idx

    # Warm up / compile.
    counts, n_matches, _ = extract_and_match(batch)
    counts = np.asarray(counts)
    n_matches = np.asarray(n_matches)
    golden_ok = counts[0] == 399 and counts[1] == 343 and n_matches[0] == 11

    best_fps = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(TIMED_ITERS):
            out = extract_and_match(batch)
            np.asarray(out[0])  # force full device->host sync
        dt = (time.time() - t0) / TIMED_ITERS
        best_fps = max(best_fps, BATCH / dt)

    ransac_fits_per_sec = _bench_ransac()
    ba_iters_per_sec = _bench_graph_ba()

    value = best_fps if golden_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "kitti_akaze_extract_match_fps_per_chip",
                "value": round(value, 2),
                "unit": "frames/sec",
                "vs_baseline": round(value / BASELINE_FPS, 4),
                "golden_counts_ok": bool(golden_ok),
                "keypoints": [int(counts[0]), int(counts[1])],
                "matches": int(n_matches[0]),
                "ransac_pose_fits_per_sec": round(ransac_fits_per_sec, 1),
                "ba_iters_per_sec": round(ba_iters_per_sec, 1),
            }
        )
    )


def _bench_ransac():
    """Eight-point RANSAC throughput: candidate pose fits scored per second
    (hypotheses x 4 models per consensus call over 512 matches; the
    CameraToCamera residual triangulates per (model, match) with the
    batched Jacobi 4x4 eigensolver)."""
    from cv_tpu.consensus import BatchConsensus, Estimator
    from cv_tpu.core import Isometry3, camera_to_camera_residual, lie, projective
    from cv_tpu.solvers import eight_point

    rng = np.random.default_rng(0)
    pose = jax.tree_util.tree_map(
        jnp.asarray,
        Isometry3(
            rotation=np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.04]))),
            translation=np.asarray([0.3, -0.1, 0.05]),
        ),
    )
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (512, 3)).astype(np.float32)
    a_h = projective.from_point(jnp.asarray(pts))
    b_h = pose.transform(a_h)
    a = projective.bearing(a_h)
    b = projective.bearing(b_h)
    est = Estimator(
        min_samples=8,
        models_per_sample=4,
        estimate=lambda s: eight_point.estimate(s[0], s[1]),
        residual=lambda m, d: camera_to_camera_residual(
            Isometry3(
                rotation=m.rotation[..., None, :, :],
                translation=m.translation[..., None, :],
            ),
            d[0],
            d[1],
        ),
    )
    hyp = 2048
    cons = BatchConsensus(threshold=1e-4, hypotheses=hyp)
    key = jax.random.key(0)
    out = cons.model_inliers(key, est, (a, b))
    np.asarray(out[2])
    t0 = time.time()
    iters = 3
    for i in range(iters):
        out = cons.model_inliers(jax.random.key(i), est, (a, b))
        np.asarray(out[2])
    dt = (time.time() - t0) / iters
    return hyp * 4 / dt


def _bench_graph_ba():
    """Graph bundle-adjustment iterations per second (64 views, 384 edges)."""
    from cv_tpu.core import lie
    from cv_tpu.sfm.engine import graph_ba_device

    rng = np.random.default_rng(0)
    v, e = 64, 384
    rot = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=(v, 3)) * 0.1)))
    trans = rng.normal(size=(v, 3))
    edge_to = rng.integers(0, v, e)
    edge_from = (edge_to + 1 + rng.integers(0, v - 1, e)) % v
    edge_rot = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=(e, 3)) * 0.05)))
    edge_t = rng.normal(size=(e, 3)) * 0.1
    iters = 1024
    args = (
        jnp.asarray(rot, jnp.float32),
        jnp.asarray(trans, jnp.float32),
        jnp.asarray(edge_to, jnp.int32),
        jnp.asarray(edge_from, jnp.int32),
        jnp.asarray(edge_rot, jnp.float32),
        jnp.asarray(edge_t, jnp.float32),
        jnp.asarray(np.ones(e, bool)),
    )
    out = graph_ba_device(*args, iterations=iters, rate=0.001)
    np.asarray(out[0])
    t0 = time.time()
    for _ in range(3):
        out = graph_ba_device(*args, iterations=iters, rate=0.001)
        np.asarray(out[0])
    dt = (time.time() - t0) / 3
    return iters / dt


if __name__ == "__main__":
    main()
