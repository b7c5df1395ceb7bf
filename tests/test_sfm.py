"""End-to-end tests of the SfM engine on synthetic scenes.

The reference has zero tests for cv-sfm (SURVEY.md section 4); we go further:
a synthetic multi-camera scene with exact descriptors must produce a
reconstruction with correct relative poses (up to scale + world frame).
"""

import numpy as np
import pytest

from cv_tpu.sfm import VSlam, VSlamData, VSlamSettings
from cv_tpu.sfm import se3
from cv_tpu.sfm.data import Feed


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
