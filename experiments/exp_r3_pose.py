"""Round-3: diagnose the pose_pipeline_ms regression (32.5 r01 -> 39.5 r02).

Decomposes the bench's KITTI pose pipeline into its dispatch pieces and
measures the raw tunnel round-trip so compute can be separated from RPC
latency.  Suspects named by the verdict: two-stage lexicographic selection,
engine imports, tunnel variance.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    # Raw tunnel round trip: dispatch one trivial program + fetch 1 elem.
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    np.asarray(f(x))
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(f(x))
        rtts.append(time.perf_counter() - t0)
    rtts = np.array(rtts) * 1e3
    print(f"tunnel RTT (trivial jit + 8-elem fetch): med {np.median(rtts):.2f} ms "
          f"min {rtts.min():.2f} p90 {np.percentile(rtts, 90):.2f}", flush=True)

    import bench

    # Full pipeline number as the bench measures it.
    ms, inl = bench._bench_pose_pipeline()
    print(f"pose_pipeline: {ms:.2f} ms, inliers {inl}", flush=True)

    # Piecewise: rebuild the same stages and time each with its own sync.
    from cv_tpu.akaze import Akaze, load_gray
    from cv_tpu.akaze.fast import FastAkazeExtractor
    from cv_tpu.camera import CameraIntrinsics
    from cv_tpu.consensus import BatchConsensus, Estimator
    from cv_tpu.core import Isometry3, camera_to_camera_residual
    from cv_tpu.matching import distance_matrix
    from cv_tpu.solvers import eight_point

    ex = FastAkazeExtractor(Akaze.sparse(), max_features=512)
    kp0, w0 = ex.extract(load_gray("/root/reference/res/0000000000.png"))
    kp14, w14 = ex.extract(load_gray("/root/reference/res/0000000014.png"))
    d = np.asarray(distance_matrix(jnp.asarray(w0), jnp.asarray(w14)))
    nn = np.argsort(d, axis=1)[:, :2]
    keep = d[np.arange(len(d)), nn[:, 0]].astype(np.float32) < d[
        np.arange(len(d)), nn[:, 1]
    ].astype(np.float32) * 0.5
    ia = np.nonzero(keep)[0]
    intr = CameraIntrinsics.from_values(
        9.842439e2, 9.808141e2, 6.9e2, 2.331966e2, dtype=jnp.float32
    )
    a = intr.calibrate(jnp.asarray(kp0["point"][ia], jnp.float32))
    b = intr.calibrate(jnp.asarray(kp14["point"][nn[ia, 0]], jnp.float32))
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
    cons2 = BatchConsensus(threshold=0.1, hypotheses=512)
    out = cons2.model_inliers(jax.random.key(0), est8, (a, b))
    np.asarray(out[2])
    for label, n in (("cons2 (8pt, 512 hyp)", 10),):
        t0 = time.perf_counter()
        for i in range(n):
            out = cons2.model_inliers(jax.random.key(i), est8, (a, b))
            np.asarray(out[2])
        print(f"{label}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
