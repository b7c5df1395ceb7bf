"""Driver benchmark: AKAZE extract + match throughput on the KITTI pair.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is frames/sec/chip for the fully-device batched AKAZE extraction
(cv_tpu.akaze.fast.DeviceExtractor) plus brute-force Hamming matching of
consecutive frames — the BASELINE.json north-star workload.  The baseline
target is 1000 fps/chip, so vs_baseline = fps / 1000.

Correctness gate: the run only counts if the extractor reproduces the
reference goldens (399/343 keypoints) on the KITTI pair.

``python bench.py --stages`` runs the criterion-analog per-stage harness
(the TPU equivalent of ``akaze/benches/criterion.rs``): each pipeline stage
is jitted as its own XLA program and timed; prints one table + one JSON line.
"""

import json
import sys
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


def _sync(out):
    """Force completion: device->host copy of one element of the last-issued
    program's first output leaf (block_until_ready is unreliable through the
    axon tunnel; TPU programs complete in issue order, so one copy syncs)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])  # slice on device; copy 1 element
    return out


def _time_jit(fn, *args, iters=5):
    """Compile, then best-of-3 mean wall time per call (ms)."""
    out = _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3, out


def stages_main(batch_size=BATCH):
    """Per-stage timing harness (criterion analog)."""
    from cv_tpu.akaze import fast
    from cv_tpu.akaze.scale_space import build_scale_space, EvolutionPlanes

    img0 = to_gray_f32(load_gray("/root/reference/res/0000000000.png"))
    img14 = to_gray_f32(load_gray("/root/reference/res/0000000014.png"))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * (batch_size // 2))

    ex = DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
    cfg, k, m = ex.config, ex.candidate_budget, ex.max_features
    h, w = img0.shape
    specs = ex._helper.specs(h, w)

    def planes_to_arrays(planes):
        return tuple((p.lt, p.lsmooth, p.lx, p.ly, p.ldet) for p in planes)

    def arrays_to_planes(arrs):
        return [
            EvolutionPlanes(spec=s, lt=a[0], lsmooth=a[1], lx=a[2], ly=a[3], ldet=a[4])
            for s, a in zip(specs, arrs)
        ]

    def strip_cand(cand):
        return tuple(
            {f: c[f] for f in ("x", "y", "px", "py", "resp", "idx", "valid")}
            for c in cand
        )

    def rebuild_cand(stripped):
        out = []
        for s, c in zip(specs, stripped):
            d = dict(c)
            d["spec"] = s
            d["size"] = np.float32(np.float32(s.esigma) * np.float32(cfg.derivative_factor))
            out.append(d)
        return out

    timings = {}

    j_ss = jax.jit(lambda imgs: planes_to_arrays(build_scale_space(cfg, specs, imgs)))
    timings["scale_space"], plane_arrs = _time_jit(j_ss, batch)

    j_cand = jax.jit(
        lambda arrs: strip_cand(
            fast.stage_candidates(cfg, specs, arrays_to_planes(arrs), k, ex.topk_method)
        )
    )
    timings["candidates_topk"], cand_s = _time_jit(j_cand, plane_arrs)

    j_dedup = jax.jit(
        lambda cs: strip_cand(fast.stage_dedup(rebuild_cand(cs), k, ex.dedup_scan_cap))
    )
    timings["dedup"], cand_s = _time_jit(j_dedup, cand_s)

    j_flat = jax.jit(lambda arrs: fast.flat_ldet_buffer(arrays_to_planes(arrs)))
    timings["flat_ldet"], flat_ldet = _time_jit(j_flat, plane_arrs)

    j_refine = jax.jit(
        lambda cs, fl: fast.stage_refine_select(cfg, specs, rebuild_cand(cs), fl, k, m)
    )
    timings["refine_select"], sel = _time_jit(j_refine, cand_s, flat_ldet)

    j_desc = jax.jit(
        lambda arrs, s: fast.stage_describe(
            cfg, arrays_to_planes(arrs), s, ex.sampler, ex.onehot_mode
        )
    )
    timings["orient_mldb"], fs = _time_jit(j_desc, plane_arrs, sel)

    j_match = jax.jit(
        lambda words, valid: distance_matrix(words[0], words[1])
        * (valid[0][:, None] & valid[1][None, :])
    )
    timings["match_pair"], _ = _time_jit(j_match, fs.words[:2], fs.valid[:2])

    counts = np.asarray(fs.count)
    total = sum(timings.values())
    print(f"# stage timings, B={batch_size}, {h}x{w}, ms/batch (separate programs)")
    for name, ms in timings.items():
        print(f"{name:>16}: {ms:8.2f} ms  ({ms / total * 100:5.1f}%)")
    print(f"{'TOTAL':>16}: {total:8.2f} ms  -> {batch_size / total * 1e3:.1f} fps upper bound")
    print(
        json.dumps(
            {
                "metric": "akaze_stage_ms",
                "batch": batch_size,
                "stages": {n: round(v, 2) for n, v in timings.items()},
                "total_ms": round(total, 2),
                "keypoints": [int(counts[0]), int(counts[1])],
            }
        )
    )


if __name__ == "__main__":
    if "--stages" in sys.argv:
        bs = BATCH
        for a in sys.argv[1:]:
            if a.isdigit():
                bs = int(a)
        stages_main(bs)
    else:
        main()
