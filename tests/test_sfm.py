"""End-to-end tests of the SfM engine on synthetic scenes.

The reference has zero tests for cv-sfm (SURVEY.md section 4); we go further:
a synthetic multi-camera scene with exact descriptors must produce a
reconstruction with correct relative poses (up to scale + world frame).
"""

from cv_tpu.utils.fixtures import fixture_path
import numpy as np
import pytest

from cv_tpu.sfm import VSlam, VSlamData, VSlamSettings
from cv_tpu.sfm import se3
from cv_tpu.sfm.data import Feed

pytestmark = pytest.mark.slow  # module-scoped engine fixture dominates


def make_scene(rng, n_landmarks=400, n_cameras=5):
    """Random landmarks + a smooth camera trajectory; returns per-camera
    (pose, bearings) with exact unique descriptors."""
    points = rng.uniform([-4, -3, 6], [4, 3, 14], (n_landmarks, 3))
    descriptors = rng.integers(0, 2**32, (n_landmarks, 16), dtype=np.uint64).astype(
        np.uint32
    )
    descriptors[:, -1] &= np.uint32((1 << (486 - 15 * 32)) - 1)
    poses = []
    for i in range(n_cameras):
        # Small lateral + forward motion with slight rotation.
        angle = 0.03 * i
        r = se3.so3_exp(np.array([0.0, angle, 0.01 * i]))
        t = -r @ np.array([0.4 * i, 0.05 * i, 0.3 * i])  # world origin motion
        poses.append((r, t))
    frames = []
    for pose in poses:
        cam = se3.apply(pose, points)
        bearings = cam / np.linalg.norm(cam, axis=-1, keepdims=True)
        frames.append(bearings)
    return points, descriptors, poses, frames


@pytest.fixture(scope="module")
def test_settings():
    # Shrink the optimization budgets so the test runs quickly; semantics
    # unchanged.
    return VSlamSettings(
        two_view_minimum_robust_matches=128,
        three_view_patience=2000,
        single_view_patience=2000,
        constraint_patience=500,
        optimization_iterations=128,
        tracking_recent_frames=8,
    )


@pytest.fixture(scope="module")
def built_engine(test_settings):
    rng = np.random.default_rng(42)
    points, descriptors, poses, frames = make_scene(rng)
    engine = VSlam(settings=test_settings, seed=7)
    feed = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
    n = len(descriptors)
    for bearings in frames:
        frame = engine.data.add_frame_features(
            feed,
            descriptors,
            bearings,
            np.linspace(1.0, 0.5, n, dtype=np.float32),
            np.zeros((n, 3), np.uint8),
        )
        rec_frames, free_frames = engine.data.find_visually_similar_and_recent_frames(
            frame, 0, engine.settings.tracking_recent_frames, 0, 512
        )
        engine.try_localize(frame, rec_frames, free_frames)
    engine.flush_pending()
    return engine, points, poses


class TestSyntheticReconstruction:
    def test_reconstruction_created(self, built_engine):
        engine, points, poses = built_engine
        assert len(engine.data.reconstructions) == 1
        rec = next(iter(engine.data.reconstructions.values()))
        assert len(rec.views) == len(poses)

    def test_relative_poses_match_ground_truth(self, built_engine):
        engine, points, poses = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        # Map views back to ground-truth cameras via frame keys.
        view_poses = {}
        for view in rec.views.values():
            view_poses[engine.data.frames[view.frame].feed_frame] = view.pose
        # Compare relative poses (i -> j) up to global scale.
        est_rel = se3.compose(view_poses[1], se3.inverse(view_poses[0]))
        true_rel = se3.compose(poses[1], se3.inverse(poses[0]))
        rot_err = np.linalg.norm(se3.so3_log(est_rel[0].T @ true_rel[0]))
        assert rot_err < 1e-2, rot_err
        t_est = est_rel[1] / np.linalg.norm(est_rel[1])
        t_true = true_rel[1] / np.linalg.norm(true_rel[1])
        assert np.linalg.norm(t_est - t_true) < 5e-2

    def test_landmarks_triangulate_correctly(self, built_engine):
        engine, points, poses = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        # Robust landmarks should triangulate near their ground-truth points
        # after mapping through the reconstruction's world frame.
        # The reconstruction world frame equals camera 0's world frame (the
        # center view starts at identity), up to scale.
        view0 = next(
            v for v in rec.views.values()
            if engine.data.frames[v.frame].feed_frame == 0
        )
        # Estimate scale from the poses.
        view1 = next(
            v for v in rec.views.values()
            if engine.data.frames[v.frame].feed_frame == 1
        )
        est_rel = se3.compose(view1.pose, se3.inverse(view0.pose))
        true_rel = se3.compose(poses[1], se3.inverse(poses[0]))
        scale = np.linalg.norm(true_rel[1]) / np.linalg.norm(est_rel[1])

        count, good = 0, 0
        from cv_tpu.sfm import host_geom

        for lm in rec.landmarks:
            hp = engine.triangulate_landmark_robust(rec_key, lm)
            p = host_geom.point_of(hp) if hp is not None else None
            if p is None:
                continue
            # Map from reconstruction world to camera-0 space, rescale, then
            # to true world.
            cam0 = se3.apply(view0.pose, p) * scale
            world = se3.apply(se3.inverse(poses[0]), cam0)
            d = np.min(np.linalg.norm(points - world, axis=-1))
            count += 1
            if d < 0.1:
                good += 1
        assert count > 100
        assert good / count > 0.9, (good, count)

    def test_export_ply(self, built_engine, tmp_path):
        engine, _, _ = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        path = tmp_path / "out.ply"
        engine.export_reconstruction(rec_key, path)
        text = path.read_text()
        assert text.startswith("ply")
        assert "element vertex" in text and "element face" in text

    def test_normalize_reconstruction(self, built_engine):
        engine, _, _ = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        engine.normalize_reconstruction(rec_key)
        rec = engine.data.reconstructions[rec_key]
        first_view = next(iter(rec.views.values()))
        # First view is now the origin.
        assert np.allclose(first_view.pose[0], np.eye(3), atol=1e-9)
        assert np.allclose(first_view.pose[1], 0.0, atol=1e-9)

    def test_save_load_roundtrip(self, built_engine, tmp_path):
        engine, _, _ = built_engine
        path = tmp_path / "vslam.cvr"
        engine.data.save(path)
        loaded = VSlamData.load(path)
        assert len(loaded.frames) == len(engine.data.frames)
        assert len(loaded.reconstructions) == len(engine.data.reconstructions)
        # Sketches are REhashed on load (scheme/codebook may differ from the
        # writer's): identical to hashing the stored descriptors now.
        assert len(loaded.frame_sketches) == len(loaded.frames)
        import jax.numpy as jnp

        from cv_tpu.matching import lsh

        f0 = loaded.sketch_frames[0]
        np.testing.assert_array_equal(
            loaded.frames[f0].sketch,
            np.asarray(lsh.hash_bag(jnp.asarray(loaded.frames[f0].descriptors))),
        )

    def test_legacy_pickle_load(self, built_engine, tmp_path):
        """The round-1 pickle format (magic-byte branch) still loads, and
        its (old-scheme) sketches are replaced by current-scheme hashes."""
        import pickle

        engine, _, _ = built_engine
        path = tmp_path / "legacy.cvr"
        with open(path, "wb") as f:
            pickle.dump(engine.data, f)
        loaded = VSlamData.load(path)
        assert len(loaded.frames) == len(engine.data.frames)
        assert len(loaded.frame_sketches) == len(loaded.frames)


class TestSanityCheck:
    def test_clean_reconstruction_has_no_violations(self, built_engine):
        engine, _, _ = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        assert engine.sanity_check(rec_key) == []

    def test_detects_corruption(self, built_engine):
        import copy

        engine, _, _ = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        view_key = next(iter(rec.views))
        saved = rec.views[view_key].landmarks[0]
        rec.views[view_key].landmarks[0] = 10**9  # dangling landmark key
        try:
            assert engine.sanity_check(rec_key) != []
        finally:
            rec.views[view_key].landmarks[0] = saved


class TestLandmarkMergeDedup:
    """merge_landmarks_dedup / observation_loss / *_robust_without_view
    (lib.rs:2818-2872, 2570-2620, 3003-3052)."""

    def _shared_view_landmarks(self, engine):
        """Find two multi-observation landmarks observed by a common view."""
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        by_view = {}
        for lm_key, lm in rec.landmarks.items():
            if len(lm.observations) < 2:
                continue
            for view in lm.observations:
                by_view.setdefault(view, []).append(lm_key)
        for view, lms in by_view.items():
            if len(lms) >= 2:
                return rec_key, view, lms[0], lms[1]
        raise AssertionError("no shared-view landmark pair in fixture")

    def test_observation_loss_singleton_is_two(self, built_engine):
        import copy

        engine, _, _ = built_engine
        data_backup = copy.deepcopy(engine.data)
        try:
            rec_key = next(iter(engine.data.reconstructions))
            rec = engine.data.reconstructions[rec_key]
            lm_key = next(
                k for k, lm in rec.landmarks.items() if len(lm.observations) >= 2
            )
            view, feature = next(iter(rec.landmarks[lm_key].observations.items()))
            assert engine.data.split_observation(rec_key, view, feature)
            assert engine.observation_loss(rec_key, view, feature) == 2.0
        finally:
            engine.data = data_backup

    def test_observation_loss_consistent_is_small(self, built_engine):
        engine, _, _ = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        lm_key = next(
            k for k, lm in rec.landmarks.items() if len(lm.observations) >= 3
        )
        view, feature = next(iter(rec.landmarks[lm_key].observations.items()))
        # Synthetic observations are exact but the view poses are BA
        # estimates, so the triangulated point only agrees to optimizer
        # precision — far below the 2.0 sentinel for broken observations.
        assert engine.observation_loss(rec_key, view, feature) < 1e-3

    def test_merge_dedup_splits_worse_observation(self, built_engine):
        import copy

        engine, _, _ = built_engine
        data_backup = copy.deepcopy(engine.data)
        try:
            rec_key, view, lm_a, lm_b = self._shared_view_landmarks(engine)
            rec = engine.data.reconstructions[rec_key]
            obs_a = dict(rec.landmarks[lm_a].observations)
            obs_b = dict(rec.landmarks[lm_b].observations)
            dup_views = [v for v in obs_a if v in obs_b]
            assert view in dup_views
            n_before = len(obs_a) + len(obs_b)
            merged = engine.merge_landmarks_dedup(rec_key, lm_a, lm_b)
            assert merged == lm_a
            assert lm_b not in rec.landmarks
            obs = rec.landmarks[lm_a].observations
            for v in dup_views:
                # Each shared view appears exactly once in the merged
                # landmark, keeping one of the two original observations...
                assert list(obs).count(v) == 1
                assert obs[v] in (obs_a[v], obs_b[v])
                # ...and the worse observation was split into its own
                # singleton landmark.
                worse = obs_b[v] if obs[v] == obs_a[v] else obs_a[v]
                split_lm = rec.views[v].landmarks[worse]
                assert split_lm != lm_a
                assert rec.landmarks[split_lm].observations == {v: worse}
            # No observations lost overall: one split per duplicate view.
            assert len(obs) + len(dup_views) == n_before
            assert engine.sanity_check(rec_key) == []
        finally:
            engine.data = data_backup

    def test_plain_merge_rejects_shared_view(self, built_engine):
        import copy

        engine, _, _ = built_engine
        data_backup = copy.deepcopy(engine.data)
        try:
            rec_key, view, lm_a, lm_b = self._shared_view_landmarks(engine)
            with pytest.raises(ValueError):
                engine.data.merge_landmarks(rec_key, lm_a, lm_b)
        finally:
            engine.data = data_backup

    def test_robust_without_view(self, built_engine):
        engine, _, _ = built_engine
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        lm_key = next(
            k
            for k, lm in rec.landmarks.items()
            if len(lm.observations) >= 3 and engine.is_landmark_robust(rec_key, k)
        )
        views = list(rec.landmarks[lm_key].observations)
        # Dropping a view from a >=3-view robust landmark usually stays
        # robust; the triangulation must then exclude that view's pose.
        point_full = engine.triangulate_landmark_robust(rec_key, lm_key)
        assert point_full is not None
        dropped = views[0]
        if engine.is_landmark_robust_without_view(rec_key, lm_key, dropped):
            point = engine.triangulate_landmark_robust_without_view(
                rec_key, lm_key, dropped
            )
            assert point is not None
            import cv_tpu.sfm.host_geom as host_geom

            p3 = host_geom.point_of(point)
            pf = host_geom.point_of(point_full)
            # Dropping one of >=3 estimated views shifts the triangulation
            # slightly (poses are BA estimates); it must stay the same point.
            assert np.linalg.norm(p3 - pf) < 0.05 * np.linalg.norm(pf)
        # Ignoring a view not in the landmark changes nothing.
        assert engine.is_landmark_robust_without_view(
            rec_key, lm_key, 10**9
        ) == engine.is_landmark_robust(rec_key, lm_key)


class TestGenericEngine:
    """The engine is generic over PE/EE/T like VSlam<C1,C2,PE,EE,T,R>
    (lib.rs:724-774): run the full synthetic pipeline with the
    Nister-Stewenius five-point estimator injected as EE."""

    def test_engine_runs_with_nister_stewenius(self, test_settings):
        import jax.numpy as jnp

        from cv_tpu.consensus import BatchConsensus, Estimator
        from cv_tpu.core import Isometry3, camera_to_camera_residual
        from cv_tpu.solvers import nister_stewenius

        est = Estimator(
            min_samples=5,
            models_per_sample=40,
            estimate=lambda s: nister_stewenius.estimate(s[0], s[1])[0],
            residual=lambda m, d: camera_to_camera_residual(
                Isometry3(
                    rotation=m.rotation[..., None, :, :],
                    translation=m.translation[..., None, :],
                ),
                d[0],
                d[1],
            ),
        )
        engine = VSlam(
            settings=test_settings,
            seed=7,
            essential_estimator=est,
            two_view_consensus=BatchConsensus(
                threshold=test_settings.two_view_consensus_threshold,
                hypotheses=48,
            ),
        )
        rng = np.random.default_rng(3)
        points, descriptors, poses, frames = make_scene(
            rng, n_landmarks=220, n_cameras=3
        )
        feed = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
        n = len(descriptors)
        for bearings in frames:
            frame = engine.data.add_frame_features(
                feed,
                descriptors,
                bearings,
                np.linspace(1.0, 0.5, n, dtype=np.float32),
                np.zeros((n, 3), np.uint8),
            )
            rec_frames, free = engine.data.find_visually_similar_and_recent_frames(
                frame, 0, engine.settings.tracking_recent_frames, 0, 512
            )
            engine.try_localize(frame, rec_frames, free)
        assert len(engine.data.reconstructions) == 1
        rec = next(iter(engine.data.reconstructions.values()))
        assert len(rec.views) == 3
        # Poses recovered: same relative rotation as ground truth (pose 0->1).
        vp = {
            engine.data.frames[v.frame].feed_frame: v.pose
            for v in rec.views.values()
        }
        got_rel = se3.compose(vp[1], se3.inverse(vp[0]))
        want_rel = se3.compose(poses[1], se3.inverse(poses[0]))
        rot_err = np.linalg.norm(se3.so3_log(got_rel[0] @ want_rel[0].T))
        assert rot_err < 1e-2, rot_err


class TestLshRetrievalAndMerge:
    """LSH loop-closure retrieval (lib.rs:597-668) and reconstruction
    merging (lib.rs:2116-2193) through the public engine flow."""

    def _scene_engine(self, test_settings, n_cameras, seed=11):
        rng = np.random.default_rng(seed)
        points, descriptors, poses, frames = make_scene(
            rng, n_landmarks=400, n_cameras=n_cameras
        )
        engine = VSlam(settings=test_settings, seed=5)
        return engine, descriptors, poses, frames

    def _add(self, engine, feed, descriptors, bearings, similar=0):
        n = len(descriptors)
        frame = engine.data.add_frame_features(
            feed,
            descriptors,
            bearings,
            np.linspace(1.0, 0.5, n, dtype=np.float32),
            np.zeros((n, 3), np.uint8),
        )
        rec_frames, free = engine.data.find_visually_similar_and_recent_frames(
            frame,
            similar,
            engine.settings.tracking_recent_frames,
            engine.settings.tracking_similar_frame_recent_threshold,
            engine.settings.tracking_similar_frame_search_num,
        )
        engine.try_localize(frame, rec_frames, free)
        return frame

    def test_lsh_retrieves_visually_identical_far_frame(self, test_settings):
        engine, descriptors, poses, frames = self._scene_engine(test_settings, 3)
        feed_a = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
        feed_b = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
        fa = self._add(engine, feed_a, descriptors, frames[0])
        # A frame in ANOTHER feed seeing the same content: recency can never
        # retrieve it, only the LSH sketch index can.
        fb = engine.data.add_frame_features(
            feed_b,
            descriptors,
            frames[1],
            np.linspace(1.0, 0.5, len(descriptors), dtype=np.float32),
            np.zeros((len(descriptors), 3), np.uint8),
        )
        none_rec, none_free = engine.data.find_visually_similar_and_recent_frames(
            fb, 0, engine.settings.tracking_recent_frames, 0, 512
        )
        assert none_free == [] and none_rec == {}
        _, free = engine.data.find_visually_similar_and_recent_frames(
            fb, 1, engine.settings.tracking_recent_frames, 0, 512
        )
        assert free == [fa]

    def test_two_reconstructions_merge_via_shared_frame(self, test_settings):
        engine, descriptors, poses, frames = self._scene_engine(
            test_settings, 7
        )
        feed_a = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
        feed_b = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
        # Feed A sees cameras 0-2, feed B cameras 4-6: recency windows never
        # cross feeds, so two independent reconstructions form.
        for i in range(3):
            self._add(engine, feed_a, descriptors, frames[i])
        for i in range(4, 7):
            self._add(engine, feed_b, descriptors, frames[i])
        assert len(engine.data.reconstructions) == 2
        # Camera 3 bridges them: with LSH retrieval on, try_localize
        # incorporates it into one reconstruction and then merges the other
        # into it (lib.rs:847-917 cascade -> try_merge_reconstructions).
        self._add(engine, feed_a, descriptors, frames[3], similar=6)
        assert len(engine.data.reconstructions) == 1
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        assert len(rec.views) == 7
        assert engine.sanity_check(rec_key) == []
        # Relative pose 0 -> 6 (crossing the merge seam) matches truth.
        vp = {
            engine.data.frames[v.frame].feed_frame: v.pose
            for v in rec.views.values()
            if engine.data.frames[v.frame].feed == feed_a
        }
        vp_b = {
            engine.data.frames[v.frame].feed_frame: v.pose
            for v in rec.views.values()
            if engine.data.frames[v.frame].feed == feed_b
        }
        got_rel = se3.compose(vp_b[2], se3.inverse(vp[0]))  # camera 6 vs 0
        want_rel = se3.compose(poses[6], se3.inverse(poses[0]))
        rot_err = np.linalg.norm(se3.so3_log(got_rel[0] @ want_rel[0].T))
        assert rot_err < 5e-2, rot_err


class TestRealImageFrontend:
    """VSlam.add_frame on the real KITTI pair: kps_descriptors -> bicubic
    colors -> calibrate -> LSH insert (lib.rs:790-809, 2195-2236), with both
    the exact extractor and the device FastAkazeExtractor."""

    KITTI0 = fixture_path("0000000000.png")
    KITTI14 = fixture_path("0000000014.png")
    # KITTI cam 0 intrinsics (res/calib_cam_to_cam.txt K_00).
    INTR = (9.842439e2, 9.808141e2, 6.9e2, 2.331966e2)

    def _engine(self, extractor_cls=None):
        from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion

        settings = VSlamSettings(
            akaze_threshold=0.01,  # sparse preset: 399/343 goldens
            tracking_features=512,
        )
        kwargs = {}
        if extractor_cls is not None:
            kwargs["extractor_cls"] = extractor_cls
        engine = VSlam(settings=settings, seed=0, **kwargs)
        intr = CameraIntrinsicsK1Distortion.new(
            CameraIntrinsics.from_values(*self.INTR), 0.0
        )
        feed = engine.add_feed(intr)
        return engine, feed

    def test_add_frame_exact_path(self):
        from cv_tpu.akaze import load_gray

        engine, feed = self._engine()
        img0 = load_gray(self.KITTI0)
        img14 = load_gray(self.KITTI14)
        f0 = engine.add_frame(feed, img0)
        f14 = engine.add_frame(feed, img14)
        fr0, fr14 = engine.data.frames[f0], engine.data.frames[f14]
        assert len(fr0) == 399 and len(fr14) == 343
        # Bearings calibrated to unit norm, z forward.
        assert np.allclose(np.linalg.norm(fr0.bearings, axis=-1), 1.0, atol=1e-9)
        assert (fr0.bearings[:, 2] > 0).all()
        # Colors bicubic-sampled from the image (grayscale -> equal RGB).
        assert fr0.colors.shape == (399, 3)
        assert fr0.colors.max() > 0
        # Frames are LSH-indexed and mutually retrievable as similar.
        _, free = engine.data.find_visually_similar_and_recent_frames(
            f14, 1, 0, 0, 512
        )
        assert free == [f0]

    def test_device_extractor_engine_parity(self):
        """FastAkazeExtractor through the SAME engine contract: identical
        keypoint counts and descriptor bits as the exact path."""
        from cv_tpu.akaze import load_gray
        from cv_tpu.akaze.fast import FastAkazeExtractor

        engine, feed = self._engine()
        dev_engine, dev_feed = self._engine(extractor_cls=FastAkazeExtractor)
        img0 = load_gray(self.KITTI0)
        f0 = engine.add_frame(feed, img0)
        d0 = dev_engine.add_frame(dev_feed, img0)
        fr, dr = engine.data.frames[f0], dev_engine.data.frames[d0]
        assert len(fr) == len(dr) == 399
        # Same descriptor multiset (order may differ on response ties).
        a = {tuple(w) for w in fr.descriptors}
        b = {tuple(w) for w in dr.descriptors}
        assert a == b


@pytest.mark.slow
class TestMergeScenarioSeeds:
    """The bench loop-closure merge scenario must not hinge on one seed
    (round-3 verdict: 'the merge metric is tuned to pass').  Run the exact
    driver-visible scenario (bench._bench_sfm_merge) at three rendered
    scenes; every one must produce >= 2 reconstructions mid-run and merge
    them by the end."""

    @pytest.mark.parametrize("seed", [5, 11, 17])
    def test_merge_across_seeds(self, seed):
        import os
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if root not in sys.path:
            sys.path.insert(0, root)
        import bench

        merged, views = bench._bench_sfm_merge(n_seg=5, seed=seed)
        assert merged, (seed, views)


class TestTrajectoryGroundTruth:
    """Absolute trajectory error against the renderer's known poses.

    The synthetic renderer (cv_tpu.apps.synth) KNOWS every camera pose, so
    the full image pipeline (AKAZE extract -> match -> register -> BA ->
    filter) is gated on trajectory QUALITY, not just registration counts:
    after a similarity (Umeyama) alignment of the estimated camera centers
    to ground truth, the ATE must be a small fraction of the trajectory
    extent, and every consecutive relative rotation must be accurate."""

    @staticmethod
    def _umeyama(src, dst):
        """Similarity transform (s, R, t) minimizing ||s R src + t - dst||."""
        mu_s, mu_d = src.mean(0), dst.mean(0)
        xs, xd = src - mu_s, dst - mu_d
        cov = xd.T @ xs / len(src)
        u, d, vt = np.linalg.svd(cov)
        sgn = np.eye(3)
        if np.linalg.det(u) * np.linalg.det(vt) < 0:
            sgn[2, 2] = -1.0
        r = u @ sgn @ vt
        var_s = (xs**2).sum() / len(src)
        s = np.trace(np.diag(d) @ sgn) / var_s
        t = mu_d - s * r @ mu_s
        return s, r, t

    def test_ate_below_two_percent(self):
        from cv_tpu.akaze.fast import FastAkazeExtractor
        from cv_tpu.apps.synth import render_sequence
        from cv_tpu.camera import CameraIntrinsics, CameraIntrinsicsK1Distortion

        n_frames = 10
        images, (fx, fy, cx, cy), true_poses = render_sequence(
            n_frames=n_frames, height=512, width=640, n_points=900, seed=0
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
        for img in images:
            engine.add_frame(feed, img)

        assert len(engine.data.reconstructions) == 1
        rec_key = next(iter(engine.data.reconstructions))
        rec = engine.data.reconstructions[rec_key]
        est = {}
        for view in rec.views.values():
            est[engine.data.frames[view.frame].feed_frame] = view.pose
        assert len(est) == n_frames, f"only {len(est)}/{n_frames} registered"

        def center(pose):
            r, t = pose
            return -r.T @ t

        est_c = np.stack([center(est[i]) for i in range(n_frames)])
        true_c = np.stack([center(true_poses[i]) for i in range(n_frames)])
        s, r, t = self._umeyama(est_c, true_c)
        resid = (s * est_c @ r.T + t) - true_c
        ate = float(np.sqrt((resid**2).sum(axis=1).mean()))
        extent = float(
            np.linalg.norm(true_c.max(axis=0) - true_c.min(axis=0))
        )
        assert ate / extent < 0.02, (ate, extent)

        # Consecutive relative rotations within 1 degree.
        for i in range(n_frames - 1):
            est_rel = se3.compose(est[i + 1], se3.inverse(est[i]))
            true_rel = se3.compose(true_poses[i + 1], se3.inverse(true_poses[i]))
            err = np.linalg.norm(se3.so3_log(est_rel[0].T @ true_rel[0]))
            assert err < np.deg2rad(1.0), (i, np.rad2deg(err))


@pytest.mark.slow
class TestAsyncOptimize:
    """settings.async_optimize defers the fused BA+filter fetch to the next
    engine call; the flush discipline must make the final state IDENTICAL
    to the synchronous path (same programs, same order, same verdicts)."""

    @staticmethod
    def _build(test_settings, async_opt):
        import dataclasses

        rng = np.random.default_rng(42)
        points, descriptors, poses, frames = make_scene(rng)
        settings = dataclasses.replace(test_settings, async_optimize=async_opt)
        engine = VSlam(settings=settings, seed=7)
        feed = engine.data.feeds.insert(Feed(intrinsics=None, frames=[]))
        n = len(descriptors)
        for bearings in frames:
            frame = engine.data.add_frame_features(
                feed,
                descriptors,
                bearings,
                np.linspace(1.0, 0.5, n, dtype=np.float32),
                np.zeros((n, 3), np.uint8),
            )
            rec_frames, free_frames = (
                engine.data.find_visually_similar_and_recent_frames(
                    frame, 0, engine.settings.tracking_recent_frames, 0, 512
                )
            )
            engine.try_localize(frame, rec_frames, free_frames)
        engine.flush_pending()
        return engine

    def test_final_state_identical_to_sync(self, test_settings):
        e_async = self._build(test_settings, True)
        e_sync = self._build(test_settings, False)
        ra = e_async.data.reconstructions
        rs = e_sync.data.reconstructions
        assert len(ra) == len(rs) == 1
        rec_a = next(iter(ra.values()))
        rec_s = next(iter(rs.values()))
        assert len(rec_a.views) == len(rec_s.views)
        assert len(rec_a.landmarks) == len(rec_s.landmarks)
        pose_a = {
            e_async.data.frames[v.frame].feed_frame: v.pose
            for v in rec_a.views.values()
        }
        pose_s = {
            e_sync.data.frames[v.frame].feed_frame: v.pose
            for v in rec_s.views.values()
        }
        assert pose_a.keys() == pose_s.keys()
        for k in pose_a:
            np.testing.assert_array_equal(pose_a[k][0], pose_s[k][0])
            np.testing.assert_array_equal(pose_a[k][1], pose_s[k][1])
        # Observation structure (landmark observation multiset per view).
        obs_a = sorted(
            tuple(sorted(lm.observations.values()))
            for lm in rec_a.landmarks.values()
        )
        obs_s = sorted(
            tuple(sorted(lm.observations.values()))
            for lm in rec_s.landmarks.values()
        )
        assert obs_a == obs_s
