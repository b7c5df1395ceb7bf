"""Regression tests for the fully-device batched extractor: it must agree
with the exact host path on the KITTI goldens (counts AND descriptor bits)."""

from cv_tpu.utils.fixtures import fixture_path
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32
from cv_tpu.akaze.fast import DeviceExtractor

KITTI0 = fixture_path("0000000000.png")
KITTI14 = fixture_path("0000000014.png")


@pytest.fixture(scope="module")
def device_features():
    ex = DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
    img0 = to_gray_f32(load_gray(KITTI0))
    img14 = to_gray_f32(load_gray(KITTI14))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)])
    return ex.extract(batch)


@pytest.mark.slow
class TestDeviceExtractorGoldens:
    def test_counts(self, device_features):
        fs = device_features
        assert np.asarray(fs.count).tolist() == [399, 343]

    def test_matches_exact_path_bitwise(self, device_features, kitti_features):
        fs = device_features
        kp0, w0, _, _ = kitti_features
        valid = np.asarray(fs.valid[0])
        pts = np.asarray(fs.point[0])[valid]
        words = np.asarray(fs.words[0])[valid]
        from scipy.spatial import cKDTree

        d, idx = cKDTree(kp0["point"]).query(pts)
        assert d.max() < 1e-3
        assert (w0[idx] == words).all()

    def test_pose_pipeline_from_device_features(self, device_features):
        """Chapter-5 golden through the device path: 11 matches, 11 inliers."""
        import jax

        from cv_tpu.camera import CameraIntrinsics
        from cv_tpu.consensus import BatchConsensus, Estimator
        from cv_tpu.core import Isometry3, camera_to_camera_residual
        from cv_tpu.matching import distance_matrix
        from cv_tpu.solvers import eight_point

        fs = device_features
        d = distance_matrix(fs.words[0], fs.words[1])
        d = jnp.where(fs.valid[0][:, None] & fs.valid[1][None, :], d, 10_000)
        neg, idx = jax.lax.top_k(-d, 2)
        keep = np.asarray(
            ((-neg[:, 0]).astype(jnp.float32) < (-neg[:, 1]).astype(jnp.float32) * 0.5)
            & fs.valid[0]
        )
        ia = np.nonzero(keep)[0]
        ib = np.asarray(idx[:, 0])[ia]
        assert len(ia) == 11
        intr = CameraIntrinsics.from_values(9.842439e2, 9.808141e2, 6.9e2, 2.331966e2)
        a = intr.calibrate(jnp.asarray(np.asarray(fs.point[0])[ia], jnp.float64))
        b = intr.calibrate(jnp.asarray(np.asarray(fs.point[1])[ib], jnp.float64))
        est = Estimator(
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
        cons = BatchConsensus(threshold=0.1, hypotheses=512)
        _, _, count = cons.model_inliers(jax.random.key(42), est, (a, b))
        assert int(count) == 11


@pytest.mark.slow
class TestDedupScanCapOverflow:
    """Keep-don't-drop overflow policy for conflicted candidates beyond
    ``dedup_scan_cap`` (fast.py stage_dedup): conflicted candidates past the
    cap skip the scan as survivors, so a tiny cap can only ADD keypoints
    relative to the exact dedup — never lose one."""

    def test_tiny_cap_superset_of_exact(self):
        img0 = to_gray_f32(load_gray(KITTI0))
        batch = jnp.asarray(img0)[None]
        # max_features far above the keypoint count so the final top-M
        # budget never binds — the comparison isolates the dedup policy.
        exact = DeviceExtractor(
            Akaze.sparse(), candidate_budget=256, max_features=2048
        ).extract(batch)
        capped = DeviceExtractor(
            Akaze.sparse(),
            candidate_budget=256,
            max_features=2048,
            dedup_scan_cap=16,  # far below the conflicted count on KITTI
        ).extract(batch)
        n_exact = int(np.asarray(exact.count)[0])
        n_capped = int(np.asarray(capped.count)[0])
        assert n_exact == 399
        assert n_capped >= n_exact
        # Every exact keypoint survives in the capped run (superset).
        pts_e = np.asarray(exact.point[0])[np.asarray(exact.valid[0])]
        pts_c = np.asarray(capped.point[0])[np.asarray(capped.valid[0])]
        from scipy.spatial import cKDTree

        d, _ = cKDTree(pts_c).query(pts_e)
        assert d.max() < 1e-3


class TestPrefetchPipeline:
    """dispatch_extract/fetch_extract must equal extract_with_sketch, and the
    engine's prefetch_extract token must flow through add_frame untouched
    (the TPU frame pipeline: extract n+1 overlaps engine work of n)."""

    def test_dispatch_fetch_equals_extract_with_sketch(self):
        from cv_tpu.akaze.fast import FastAkazeExtractor

        rng = np.random.default_rng(0)
        img = (rng.uniform(0, 255, (128, 160)).astype(np.uint8))
        ex = FastAkazeExtractor(
            Akaze(detector_threshold=0.001), candidate_budget=128,
            max_features=128,
        )
        kp_a, w_a, sk_a = ex.extract_with_sketch(img)
        kp_b, w_b, sk_b = ex.fetch_extract(ex.dispatch_extract(img))
        np.testing.assert_array_equal(w_a, w_b)
        np.testing.assert_array_equal(sk_a, sk_b)
        for k in kp_a:
            np.testing.assert_array_equal(kp_a[k], kp_b[k])

    def test_engine_prefetch_token(self):
        from cv_tpu.akaze.fast import FastAkazeExtractor
        from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion
        from cv_tpu.sfm import VSlam, VSlamSettings

        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (128, 160)).astype(np.uint8)
        settings = VSlamSettings(akaze_threshold=0.001, tracking_features=128)
        engine = VSlam(settings=settings, seed=0, extractor_cls=FastAkazeExtractor)
        intr = CameraIntrinsicsK1Distortion.new(
            CameraIntrinsics.from_values(120.0, 120.0, 80.0, 64.0), 0.0
        )
        feed = engine.add_feed(intr)
        token = engine.prefetch_extract(feed, img)
        assert token.handle is not None
        frame = engine.add_frame(feed, token)
        plain = engine.add_frame(feed, img)
        fa, fb = engine.data.frames[frame], engine.data.frames[plain]
        np.testing.assert_array_equal(fa.descriptors, fb.descriptors)
        np.testing.assert_array_equal(fa.sketch, fb.sketch)


class TestInterleavedCut:
    """'+inter' describe mode: the pixel-interleaved plane stack and its one
    (128, 384) row-contiguous patch slice must be BIT-identical to the
    channel-major path — the layout change exists purely to cut the gather
    row count 3x (docs/perf-notes.md round 4)."""

    def test_words_bitwise_equal(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (192, 256)).astype(np.uint8)
        batch = jnp.asarray(to_gray_f32(img))[None]
        base = DeviceExtractor(
            Akaze(detector_threshold=0.001),
            candidate_budget=128,
            max_features=256,
            onehot_mode="highest",
        ).extract(batch)
        inter = DeviceExtractor(
            Akaze(detector_threshold=0.001),
            candidate_budget=128,
            max_features=256,
            onehot_mode="highest+inter",
        ).extract(batch)
        assert int(np.asarray(base.count)[0]) > 20
        np.testing.assert_array_equal(
            np.asarray(base.valid), np.asarray(inter.valid)
        )
        np.testing.assert_array_equal(
            np.asarray(base.words), np.asarray(inter.words)
        )
        np.testing.assert_array_equal(
            np.asarray(base.angle), np.asarray(inter.angle)
        )


class TestGroupDescribe:
    """'pgroups' describe mode: tile-coherent shared-window group select
    (round-5; no patch cut, no patch buffer).  Valid slots must be
    BIT-identical to the one-hot path; invalid slots are deterministic
    zero-sample rows."""

    def test_words_bitwise_equal(self):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (192, 256)).astype(np.uint8)
        batch = jnp.asarray(to_gray_f32(img))[None]
        base = DeviceExtractor(
            Akaze(detector_threshold=0.001),
            candidate_budget=128,
            max_features=256,
            onehot_mode="highest",
        ).extract(batch)
        grp = DeviceExtractor(
            Akaze(detector_threshold=0.001),
            candidate_budget=128,
            max_features=256,
            onehot_mode="pgroups",
        ).extract(batch)
        assert int(np.asarray(base.count)[0]) > 20
        v = np.asarray(base.valid)
        np.testing.assert_array_equal(v, np.asarray(grp.valid))
        np.testing.assert_array_equal(
            np.asarray(base.words)[v], np.asarray(grp.words)[v]
        )
        np.testing.assert_array_equal(
            np.asarray(base.angle)[v], np.asarray(grp.angle)[v]
        )


class TestEpatchCut:
    """'pepatch' describe mode: the patch cut happens inside the Pallas
    kernel as per-keypoint ELEMENT-offset block DMAs (pl.Element specs) —
    no patch buffer, no XLA row gathers.  Must be BIT-identical to the
    one-hot path (and hence to pgather, which equals it on-device)."""

    def test_words_bitwise_equal(self):
        # The retired kernel lives in experiments/; importing registers it.
        import experiments.pallas_mldb_losers  # noqa: F401

        rng = np.random.default_rng(3)
        img = rng.uniform(0, 255, (192, 256)).astype(np.uint8)
        batch = jnp.asarray(to_gray_f32(img))[None]
        base = DeviceExtractor(
            Akaze(detector_threshold=0.001),
            candidate_budget=128,
            max_features=256,
            onehot_mode="highest",
        ).extract(batch)
        ep = DeviceExtractor(
            Akaze(detector_threshold=0.001),
            candidate_budget=128,
            max_features=256,
            onehot_mode="pepatch",
        ).extract(batch)
        assert int(np.asarray(base.count)[0]) > 20
        np.testing.assert_array_equal(np.asarray(base.valid), np.asarray(ep.valid))
        np.testing.assert_array_equal(np.asarray(base.words), np.asarray(ep.words))
        np.testing.assert_array_equal(np.asarray(base.angle), np.asarray(ep.angle))
