"""Driver benchmark: AKAZE extract + match throughput on the KITTI pair.

Prints the flagship JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
immediately after (and flushed from) the extract+match phase, then runs the
secondary phases (SfM engine, pose pipeline, merge, RANSAC, BA) under a
wall-clock budget (BENCH_BUDGET_S, default 300 s) and re-prints the same
line extended with their numbers.  Parsing either the first or the last
JSON line of stdout yields a valid record even if the process is killed
mid-run (round-3 post-mortem: one end-of-run print + a driver timeout
recorded nothing).

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

# Persistent compilation cache: the heavy programs (AKAZE batch, P3P
# consensus) compile once per machine; driver re-runs start warm.
jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze.fast import DeviceExtractor
from cv_tpu.matching import distance_matrix
from cv_tpu.utils.fixtures import fixture_path

import os

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
TIMED_ITERS = 5
BASELINE_FPS = 1000.0

# Wall-clock discipline (round-3 post-mortem: the driver's capture window
# timed out before the single end-of-run print, recording nothing).  The
# flagship JSON line is now printed AND flushed the moment the extract+match
# phase completes; every later phase runs only if its estimated cost fits
# the remaining budget, and a final, complete JSON line re-prints the same
# flagship metric plus whatever extras landed.  A stall in any late phase
# can no longer zero the round.
T0 = time.time()
# 540 s: the driver's outer timeout completed a ~500 s round-2 run and
# killed a much longer round-3 one; with per-phase checkpoint lines a kill
# mid-extras still records everything that landed.
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
# Round-4 post-mortem: the driver's environment ran the flagship phase in
# 932 s (cold compile cache + tunnel weather) vs the builder's 111 s, so the
# 540 s budget was exhausted before the FIRST phase() call and every
# secondary metric recorded null for the second round running.  The extras
# now get a guaranteed minimum window of their own, measured from the moment
# the flagship line prints — a slow flagship can delay the extras but can no
# longer erase them.
EXTRAS_MIN_S = float(os.environ.get("BENCH_EXTRAS_MIN_S", "300"))
# Phases estimated at or under this always get one attempt while the
# overdraft allowance lasts, budget notwithstanding (cheap-phases-first
# ordering in main() puts them before the expensive ones).
GRACE_EST_S = 60.0
GRACE_OVERDRAFT_S = 120.0


def _probe_device(timeout_s=150.0):
    """Bounded device-health check in a SUBPROCESS (a hung axon fetch can't
    be interrupted in-process).  Returns None when healthy, else a reason
    string.  On a wedged tunnel the main run would hang forever and the
    round would record NOTHING (round-3 post-mortem); with the probe the
    stdout tail at least carries a diagnosable zero-record."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "jax.config.update('jax_compilation_cache_dir', '/tmp/cv_tpu_jax_cache');"
        "np.asarray((jnp.ones((128, 128)) * 2).sum())"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
        if r.returncode != 0:
            return f"device probe failed rc={r.returncode}"
        return None
    except subprocess.TimeoutExpired:
        return f"axon tunnel wedged (trivial fetch hung {timeout_s:.0f}s)"
    except Exception as e:  # noqa: BLE001 - diagnostic path
        return f"device probe error: {e}"


def main():
    health = _probe_device()
    if health is not None:
        # Diagnosable zero-record first, then still attempt the real run
        # (the tunnel may recover mid-run; a later line supersedes this).
        print(
            json.dumps(
                {
                    "metric": "kitti_akaze_extract_match_fps_per_chip",
                    "value": 0.0,
                    "unit": "frames/sec/chip",
                    "vs_baseline": 0.0,
                    "golden_counts_ok": False,
                    "error": health,
                }
            ),
            flush=True,
        )
    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
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

    def burst():
        t0 = time.time()
        for _ in range(TIMED_ITERS):
            out = extract_and_match(batch)
        # ONE sync after the burst: TPU programs complete in issue order,
        # so syncing the last batch bounds all of them.  Syncing every
        # iteration would add a full tunnel round trip (~28 ms, see
        # tunnel_rtt_ms) per batch and measure the relay, not the chip.
        np.asarray(out[0])
        return BATCH / ((time.time() - t0) / TIMED_ITERS)

    # The axon tunnel intermittently stalls device->host fetches for
    # minutes at a time (observed 105 s for an 8-element fetch).  Every
    # fetch before the flagship line is stall exposure, so the line is
    # printed after exactly ONE timed burst (two fetches total since
    # warmup); extra bursts only sharpen the number afterwards if the
    # wall-clock budget allows.
    best_fps = burst()

    value = best_fps if golden_ok else 0.0
    result = {
        "metric": "kitti_akaze_extract_match_fps_per_chip",
        "value": round(value, 2),
        "unit": "frames/sec",
        "vs_baseline": round(value / BASELINE_FPS, 4),
        "golden_counts_ok": bool(golden_ok),
        "keypoints": [int(counts[0]), int(counts[1])],
        "matches": int(n_matches[0]),
    }
    # The flagship line lands NOW — a stall in any later phase can no
    # longer cost the round its number.
    print(json.dumps(result), flush=True)


    # Extra phases, most important first, each gated on the remaining
    # wall-clock budget (estimates are warm-cache measurements; a cold
    # compile overshoots its phase but the gate still bounds the total).
    # The cumulative result line re-prints after every phase: if the
    # driver's outer timeout kills the process mid-extras, the last line
    # on stdout is still a complete record of everything that landed
    # (round-3 post-mortem: the driver parses the stdout tail even on
    # rc=124).
    skipped = []
    phase_s = {"extract_match": round(time.time() - T0, 1)}
    # Extras budget: whatever the overall budget left over, but never less
    # than EXTRAS_MIN_S (round-4 post-mortem: a 932 s flagship zeroed every
    # secondary metric).  Clocked from now, not from T0.
    t_extras = time.time()
    extras_budget = max(BENCH_BUDGET_S - (t_extras - T0), EXTRAS_MIN_S)

    def phase(name, est_s, fn):
        rem = extras_budget - (time.time() - t_extras)
        # Cheap phases keep getting one attempt each inside the overdraft
        # allowance even when the nominal budget is gone — they are the
        # phases a slow environment can still afford, and main() orders
        # them first.
        if rem < est_s and not (est_s <= GRACE_EST_S and rem > -GRACE_OVERDRAFT_S):
            skipped.append(name)
            return None
        t = time.time()
        try:
            return fn()
        except Exception:
            skipped.append(name + ":error")
            return None
        finally:
            phase_s[name] = round(time.time() - t, 1)

    def checkpoint():
        out = dict(result)
        if skipped:
            out["skipped_phases"] = skipped
        out["phase_s"] = phase_s
        out["bench_wall_s"] = round(time.time() - T0, 1)
        print(json.dumps(out), flush=True)

    # Median host<->device round trip (trivial jit + 1 fetch).
    # Latency-bound metrics below (pose_pipeline_ms, SfM fps) include one
    # or more of these per step: on this axon tunnel the RTT is ~25-30 ms,
    # which dominates them — the same code co-located with the TPU would
    # subtract it.
    # Cheap phases FIRST (round-4 post-mortem: fixed-order expensive-first
    # phases meant a slow environment recorded nothing about the engine).
    rtt = phase("tunnel_rtt", 3, _bench_tunnel_rtt)
    result["tunnel_rtt_ms"] = round(rtt, 2) if rtt is not None else None
    checkpoint()

    rs = phase("ransac", 20, _bench_ransac)
    result["ransac_pose_fits_per_sec"] = round(rs, 1) if rs is not None else None

    ba = phase("graph_ba", 15, _bench_graph_ba)
    result["ba_iters_per_sec"] = round(ba, 1) if ba is not None else None
    checkpoint()

    pp = phase("pose_pipeline", 30, _bench_pose_pipeline)
    result["pose_pipeline_ms"] = round(pp[0], 2) if pp else None
    result["pose_pipeline_inliers"] = pp[1] if pp else None
    checkpoint()

    rf = phase("roofline", 30, _bench_roofline)
    result["roofline"] = rf
    checkpoint()

    sfm = phase("sfm_end_to_end", 150, _bench_sfm_end_to_end)
    result["sfm_end_to_end_fps"] = round(sfm[0], 2) if sfm else None
    result["sfm_views"] = sfm[1] if sfm else None
    result["sfm_landmarks"] = sfm[2] if sfm else None
    checkpoint()

    # Loop-closure merge scenario: two disjoint trajectory segments form
    # separate reconstructions; a mid-trajectory revisit must retrieve
    # BOTH via the LSH sketch shortlist + descriptor rerank and trigger
    # try_merge_reconstructions (lib.rs:2116-2193 parity on the
    # driver-visible path).
    mg = phase("sfm_merge", 90, _bench_sfm_merge)
    result["sfm_merge_ok"] = mg[0] if mg else None
    result["sfm_merge_views"] = mg[1] if mg else None
    checkpoint()

    # Dense-regime anchor: default-threshold counts vs the NumPy-oracle
    # goldens (akaze/src/lib.rs:169-185 defaults; counts 3425/2908 anchored
    # by tests/test_oracle.py).  Estimated at its COLD compile cost — a
    # fresh B=2/M=4096 extract program — so it only runs when real budget
    # remains; in a warm cache it takes a few seconds.
    da = phase("dense_anchor", 150, _bench_dense_anchor)
    result["dense_anchor_counts"] = da[0] if da else None
    result["dense_anchor_ok"] = da[1] if da else None
    checkpoint()

    # Sharpen the flagship number last: extra timed bursts only after every
    # secondary metric has had its chance to land.
    for i in range(2):
        fps = phase(f"extra_burst{i}", 30, burst)
        if fps is not None and golden_ok and fps > result["value"]:
            result["value"] = round(fps, 2)
            result["vs_baseline"] = round(fps / BASELINE_FPS, 4)
    checkpoint()


def _bench_roofline(batch_size=BATCH):
    """Scale-space bandwidth roofline: achieved GB/s against the chip's
    measured copy bandwidth (docs/perf-notes.md 'Roofline': the diffusion +
    detector-response stage is HBM-bound, so its achieved fraction of peak
    is the per-chip check behind the 1000-fps-needs-v5p claim).

    The traffic model counts each separable filter as two read+write plane
    traversals, PM-g2 as a 3-plane pass and each FED tau as a 3-plane
    stencil pass — the naive-pass model the perf notes derive ~8.2 GB at
    B=8 from (XLA fuses some chains, so achieved/model can exceed 1 on a
    fast chip; the FRACTION of copy peak is the portable number)."""
    from cv_tpu.akaze.fast import DeviceExtractor
    from cv_tpu.akaze.scale_space import build_scale_space

    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    batch = jnp.stack(
        [jnp.asarray(img0), jnp.asarray(img14)] * (batch_size // 2)
    )
    ex = DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
    h, w = img0.shape
    specs = ex._helper.specs(h, w)

    model_bytes = 0.0
    for i, s in enumerate(specs):
        plane = batch_size * s.height * s.width * 4.0
        n_tau = len(s.fed_tau_steps)
        if i == 0:
            # blur (2 passes) + response filters (5 x 2 passes) + Ldet
            passes = 2 * 2 + 20 * 2 + 4
        else:
            # half/copy + blur + Scharr x2 + pm_g2 + FED + response + Ldet
            passes = 2 + 2 * 2 + 2 * 2 * 2 + 3 + 3 * n_tau + 20 * 2 + 4
        model_bytes += plane * passes / 2.0  # passes counted in half-passes

    j_ss = jax.jit(
        lambda imgs: tuple(p.ldet for p in build_scale_space(ex.config, specs, imgs))
    )
    ss_ms, _ = _time_jit(j_ss, batch)

    # Copy-bandwidth probe: 8 dependent elementwise passes over 256 MB in
    # ONE program (a single-pass kernel is dispatch-bound through the axon
    # tunnel — measured 84 GB/s apparent vs ~800 peak; chaining passes
    # amortizes the dispatch into real device time).
    big = jnp.zeros((64, 1024, 1024), jnp.float32)

    def _chain(x):
        for _ in range(8):
            x = x * 1.0000001 + 1.0
        return x

    j_copy = jax.jit(_chain)
    copy_ms, _ = _time_jit(j_copy, big)
    copy_gbps = 8 * 2 * big.size * 4 / (copy_ms * 1e-3) / 1e9

    achieved = model_bytes / (ss_ms * 1e-3) / 1e9
    return {
        "scale_space_ms": round(ss_ms, 2),
        "model_gb": round(model_bytes / 1e9, 2),
        "achieved_gbps": round(achieved, 1),
        "copy_gbps": round(copy_gbps, 1),
        "bw_fraction": round(achieved / copy_gbps, 3),
    }


def _bench_dense_anchor():
    """Default-threshold (1e-3) extraction counts on the KITTI pair vs the
    NumPy-oracle anchors 3425/2908 (reference defaults akaze/src/lib.rs:
    169-185; oracle gate in tests/test_oracle.py).  The device extractor is
    allowed the documented fringe tolerance (sub-ULP near-ties at the
    threshold and dedup boundaries): counts must land within 0.5%."""
    from cv_tpu.akaze.fast import DeviceExtractor

    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)])
    # dedup_scan_cap must cover the conflicted-candidate count at the dense
    # threshold (the default 1024 overflows there and the keep-don't-drop
    # policy then saturates max_features with duplicates — r5 bench run).
    ex = DeviceExtractor(
        Akaze(), candidate_budget=2048, max_features=4096,
        dedup_scan_cap=8192,
    )
    counts = np.asarray(ex.extract(batch).count)
    anchors = (3425, 2908)
    ok = all(
        abs(int(c) - a) <= max(2, int(0.005 * a))
        for c, a in zip(counts, anchors)
    )
    return [int(counts[0]), int(counts[1])], bool(ok)


def _bench_tunnel_rtt():
    """Median round-trip of one trivial dispatch + 8-element fetch."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


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


def _bench_pose_pipeline():
    """BASELINE config 'KITTI pose pipeline': two-view relative pose from
    the KITTI pair's 11 golden matches (eight-point consensus), Linear-Eigen
    triangulation of the inliers, then Lambda-Twist P3P re-localization from
    the triangulated world points.  Returns (ms per full pipeline run,
    final P3P inlier count)."""
    from cv_tpu.akaze import Akaze, load_gray
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.camera import CameraIntrinsics
    from cv_tpu.consensus import BatchConsensus, Estimator
    from cv_tpu.core import (
        Isometry3,
        camera_to_camera_residual,
        world_to_camera_residual,
    )
    from cv_tpu.solvers import eight_point, lambda_twist
    from cv_tpu.triangulate import linear_eigen

    ex = FastAkazeExtractor(Akaze.sparse(), max_features=512)
    kp0, w0 = ex.extract(load_gray(fixture_path("0000000000.png")))
    kp14, w14 = ex.extract(load_gray(fixture_path("0000000014.png")))
    d = np.asarray(distance_matrix(jnp.asarray(w0), jnp.asarray(w14)))
    nn = np.argsort(d, axis=1)[:, :2]
    d0 = d[np.arange(len(d)), nn[:, 0]]
    d1 = d[np.arange(len(d)), nn[:, 1]]
    keep = d0.astype(np.float32) < d1.astype(np.float32) * 0.5
    ia = np.nonzero(keep)[0]
    ib = nn[ia, 0]
    intr = CameraIntrinsics.from_values(
        9.842439e2, 9.808141e2, 6.9e2, 2.331966e2, dtype=jnp.float32
    )
    a = intr.calibrate(jnp.asarray(kp0["point"][ia], jnp.float32))
    b = intr.calibrate(jnp.asarray(kp14["point"][ib], jnp.float32))

    est8 = Estimator(
        min_samples=8,
        models_per_sample=4,
        estimate=lambda s: eight_point.estimate(s[0], s[1]),
        residual=lambda m, dd: camera_to_camera_residual(
            Isometry3(
                rotation=m.rotation[..., None, :, :],
                translation=m.translation[..., None, :],
            ),
            dd[0],
            dd[1],
        ),
    )
    def _p3p_estimate(s):
        poses, valid = lambda_twist.estimate(s[0], s[1])
        bad = ~valid
        return Isometry3(
            # Zero-poisoning, not NaN: a jnp.where with a NaN constant
            # after the P3P solver SIGABRTs the axon TPU compiler.  A zero
            # pose maps every point to the zero vector, whose bearing is
            # NaN at runtime, so scoring's isfinite() still rejects it.
            rotation=jnp.where(bad[..., None, None], 0.0, poses.rotation),
            translation=jnp.where(bad[..., None], 0.0, poses.translation),
        )

    est_p3p = Estimator(
        min_samples=3,
        models_per_sample=4,
        estimate=_p3p_estimate,
        residual=lambda m, dd: world_to_camera_residual(
            Isometry3(
                rotation=m.rotation[..., None, :, :],
                translation=m.translation[..., None, :],
            ),
            dd[0],
            dd[1],
        ),
    )
    cons2 = BatchConsensus(threshold=0.1, hypotheses=512)
    cons1 = BatchConsensus(threshold=1e-2, hypotheses=128)

    # Three separately-jitted stages (consensus calls are jitted inside
    # BatchConsensus; one mega-program SIGABRTs the remote TPU compiler).
    @jax.jit
    def triangulate_stage(pose, a, b, mask):
        poses = Isometry3(
            rotation=jnp.stack([jnp.eye(3, dtype=a.dtype), pose.rotation]),
            translation=jnp.stack([jnp.zeros(3, a.dtype), pose.translation]),
        )
        bearings = jnp.stack([a, b], axis=-2)  # (N, 2, 3)
        pts, ok = linear_eigen.triangulate_observations(
            Isometry3(
                rotation=poses.rotation[None],
                translation=poses.translation[None],
            ),
            bearings,
        )
        # P3P consumes homogeneous world points; order valid+inlier points
        # first so n_valid covers them.
        good = ok & mask
        order = jnp.argsort(jnp.where(good, 0, 1))
        return pts[order], b[order], jnp.sum(good)

    def pipeline(key, a, b):
        k2, k1 = jax.random.split(key)
        pose, mask, _ = cons2.model_inliers(k2, est8, (a, b))
        pts_o, b_o, n_good = triangulate_stage(pose, a, b, mask)
        model, _, count = cons1.model_inliers(
            k1, est_p3p, (b_o, pts_o), n_valid=n_good
        )
        return model, count

    key = jax.random.key(7)
    model, count = pipeline(key, a, b)
    n_inl = int(np.asarray(count))
    t0 = time.time()
    iters = 10
    for i in range(iters):
        out = pipeline(jax.random.key(i), a, b)
        np.asarray(out[1])
    ms = (time.time() - t0) / iters * 1e3
    return ms, n_inl


def _bench_sfm_end_to_end():
    """BASELINE config 'vslam-sandbox end-to-end SfM': run the full engine
    (device AKAZE frontend + matching + consensus + triangulation + BA) over
    a rendered 12-frame synthetic sequence; frames/sec includes everything
    but rendering.  Returns (fps, views_in_reconstruction, landmarks).

    Two passes with independent engines: the first (untimed) compiles every
    bucket-shaped engine program the sequence exercises; the second measures
    steady state.  The reference has no compile step, and XLA programs
    compile once per shape per machine (persistent cache) — timing the
    compile pass would measure the axon remote compiler, not the framework
    (round-2's 0.03 fps driver capture did exactly that; the steady-state
    number is the meaningful one and is what a long-running vslam-sandbox
    session sees).  Sequence-identical passes hit identical buckets, so the
    warm pass covers every program of the timed pass."""
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
        # The reference's 256-inlier floor assumes 8192-feature frames
        # (settings.rs); scaled to this 1024-feature budget: 256/8 = 32.
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

    def run(extractor):
        engine = VSlam(
            settings=settings, seed=0, extractor_cls=lambda *a, **k: extractor
        )
        feed = engine.add_feed(intr)
        t0 = time.time()
        # Pipelined frontend: frame n+1's extraction is dispatched before
        # frame n's engine work, so the device computes it during the
        # host-side gaps of the engine logic (engine.prefetch_extract).
        token = engine.prefetch_extract(feed, images[0])
        for nxt in images[1:]:
            nxt_token = engine.prefetch_extract(feed, nxt)
            engine.add_frame(feed, token)
            token = nxt_token
        engine.add_frame(feed, token)
        return engine, time.time() - t0

    # Share one extractor between passes (its jit cache is per instance),
    # constructed exactly as the engine would construct it.
    from cv_tpu.akaze import Akaze

    extractor = FastAkazeExtractor(
        Akaze(
            detector_threshold=settings.akaze_threshold,
            maximum_features=settings.tracking_features,
        )
    )
    run(extractor)  # compile pass (untimed)
    engine, dt = run(extractor)  # steady-state pass
    engine.flush_pending()  # finalize any async BA before reading state
    views = 0
    landmarks = 0
    for rec in engine.data.reconstructions.values():
        views = max(views, len(rec.views))
        landmarks = max(landmarks, len(rec.landmarks))
    return len(images) / dt, views, landmarks


def _bench_sfm_merge(n_seg=5, seed=5):
    """Revisit-triggers-merge scenario (experiments/exp_r3_merge.py):
    segment A and the trajectory's far end form two reconstructions (the
    viewpoint gap defeats cross-segment registration); mid-trajectory
    bridge frames retrieve both segments through the sketch shortlist +
    descriptor rerank and must merge them.  Returns (merged, final_views).

    ``seed`` varies the rendered scene; tests/test_sfm.py gates the
    scenario across multiple seeds (round-3 verdict: one tuned scenario is
    thin evidence), the bench runs the canonical seed 5.
    """
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.apps.synth import render_sequence
    from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
    from cv_tpu.sfm import VSlam, VSlamSettings

    gap = int(2.7 * n_seg)
    n_total = n_seg + gap + n_seg
    images, (fx, fy, cx, cy), _ = render_sequence(
        n_frames=n_total, height=512, width=640, n_points=1200, seed=seed
    )
    seg_a = list(range(0, n_seg))
    seg_b = list(range(n_seg + gap, n_total))
    mid = n_seg + gap // 2
    order = seg_a + seg_b + [mid - 1, mid, mid + 1]
    settings = VSlamSettings(
        akaze_threshold=0.001,
        tracking_features=1024,
        two_view_minimum_robust_matches=32,
        optimization_iterations=256,
        three_view_patience=4000,
        single_view_patience=4000,
        constraint_patience=1000,
        tracking_recent_frames=3,
        tracking_similar_frames=6,
        tracking_similar_frame_recent_threshold=3,
        tracking_similar_frame_search_num=64,
    )
    engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
    intr = CameraIntrinsicsK1Distortion.new(
        CameraIntrinsics.from_values(fx, fy, cx, cy), 0.0
    )
    feed = engine.add_feed(intr)
    max_recs = 0
    for i in order:
        engine.add_frame(feed, images[i])
        max_recs = max(max_recs, len(engine.data.reconstructions))
    engine.flush_pending()
    final = len(engine.data.reconstructions)
    views = max(
        (len(r.views) for r in engine.data.reconstructions.values()), default=0
    )
    return bool(max_recs >= 2 and final < max_recs), views


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

    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
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

    j_refine = jax.jit(
        lambda cs, arrs: fast.stage_refine_select(
            cfg, specs, rebuild_cand(cs), arrays_to_planes(arrs), k, m
        )
    )
    timings["refine_select"], sel = _time_jit(j_refine, cand_s, plane_arrs)

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

    # TPU-resident f32 five-point (round 5: double-word nullspace +
    # charpoly + complex-free Smith-division Durand-Kerner — ops/dw.py;
    # the pre-round-5 host-f64 escape this harness used to time no longer
    # exists, and jax.experimental.enable_x64 is gone from this jax).
    # Jitted: consensus always runs it under jit; eager dispatch of the
    # ~thousands of small ops costs ~35 s through the tunnel.
    import time as _time

    from cv_tpu.solvers import nister_stewenius

    rng = np.random.default_rng(0)
    pts5 = rng.uniform([-2, -2, 4], [2, 2, 10], (64, 5, 3))
    a5 = pts5 / np.linalg.norm(pts5, axis=-1, keepdims=True)
    b5 = a5 + rng.normal(scale=1e-2, size=a5.shape)
    b5 /= np.linalg.norm(b5, axis=-1, keepdims=True)
    a5d = jnp.asarray(a5, jnp.float32)
    b5d = jnp.asarray(b5, jnp.float32)
    j5 = jax.jit(nister_stewenius.estimate)
    out5d = j5(a5d, b5d)
    np.asarray(out5d[1])
    t5 = _time.perf_counter()
    out5d = j5(a5d, b5d)
    np.asarray(out5d[1])
    timings["five_point_device(64 sets)"] = (_time.perf_counter() - t5) * 1e3

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


def filters_main():
    """Per-filter micro-bench: horizontal/vertical separable filters at
    kernel sizes 7 and 71 on the KITTI frame — the analog of the
    reference's criterion filter benches (akaze/benches/criterion.rs:25-52,
    which measure the same two kernel sizes on the same image)."""
    from cv_tpu.ops import image as ops

    img = jnp.asarray(to_gray_f32(load_gray(fixture_path("0000000000.png"))))
    timings = {}
    for size in (7, 71):
        kernel = ops.gaussian_kernel(size / 4.0, size)
        for name, fn in (
            ("horizontal", ops.horizontal_filter),
            ("vertical", ops.vertical_filter),
        ):
            j = jax.jit(lambda x, fn=fn, kernel=kernel: fn(x, kernel))
            timings[f"{name}_k{size}"], _ = _time_jit(j, img)
    for name, ms in timings.items():
        print(f"{name:>16}: {ms:8.3f} ms")
    print(
        json.dumps(
            {
                "metric": "akaze_filter_ms",
                "filters": {n: round(v, 3) for n, v in timings.items()},
            }
        )
    )


if __name__ == "__main__":
    if "--filters" in sys.argv:
        filters_main()
    elif "--roofline" in sys.argv:
        print(json.dumps({"metric": "scale_space_roofline", **_bench_roofline()}))
    elif "--dense-anchor" in sys.argv:
        counts, ok = _bench_dense_anchor()
        print(
            json.dumps(
                {
                    "metric": "dense_anchor",
                    "counts": counts,
                    "anchors": [3425, 2908],
                    "ok": ok,
                }
            )
        )
    elif "--stages" in sys.argv:
        bs = BATCH
        for a in sys.argv[1:]:
            if a.isdigit():
                bs = int(a)
        stages_main(bs)
    else:
        main()
