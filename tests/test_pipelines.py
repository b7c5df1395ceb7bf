"""BASELINE.json config coverage: the KITTI pose pipeline with the
five-point solver + P3P + triangulation, apps smoke tests, and host/device
math cross-checks."""

from cv_tpu.utils.fixtures import fixture_path
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.camera import CameraIntrinsics
from cv_tpu.consensus import BatchConsensus, Estimator
from cv_tpu.core import (
    CameraToCamera,
    Isometry3,
    camera_to_camera_residual,
    lie,
    projective,
    world_to_camera_residual,
)
from cv_tpu.matching import match_descriptors
from cv_tpu.solvers import lambda_twist, nister_stewenius
from cv_tpu.triangulate import triangulate_relative

KITTI_INTRINSICS = (9.842439e2, 9.808141e2, 6.9e2, 2.331966e2)


@pytest.mark.slow
class TestKittiPosePipeline:
    """BASELINE config: 'Pose pipeline: Nister-Stewenius five-point +
    lambda-twist P3P + cv-geom triangulation on KITTI pair'."""

    @pytest.fixture(scope="class")
    def kitti_pose(self, kitti_features):
        kp0, w0, kp14, w14 = kitti_features
        ia, ib = match_descriptors(w0, w14)
        intr = CameraIntrinsics.from_values(*KITTI_INTRINSICS)
        a = intr.calibrate(jnp.asarray(kp0["point"][ia], jnp.float64))
        b = intr.calibrate(jnp.asarray(kp14["point"][ib], jnp.float64))
        return a, b

    def test_five_point_consensus_on_kitti(self, kitti_pose):
        a, b = kitti_pose
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
        # 0.01 keeps all 11 true inliers while rejecting the
        # wrong-motion models that tie at 11 under a loose 0.1 threshold
        # (the argmax tie-break is sensitive to estimator rounding).
        cons = BatchConsensus(threshold=0.01, hypotheses=64)
        model, mask, count = cons.model_inliers(jax.random.key(1), est, (a, b))
        # The 11 matches are all inliers of the correct motion (the 8pt
        # pipeline finds 11/11); five-point must agree.
        assert int(count) == 11
        t = np.asarray(model.translation)
        # Dominant forward motion.
        assert abs(t[2]) > 0.8 * np.linalg.norm(t)

    def test_triangulate_then_p3p_recovers_pose(self, kitti_pose):
        """Close the loop: triangulate landmarks from the two-view pose, then
        recover the second camera with P3P from those landmarks."""
        a, b = kitti_pose
        from cv_tpu.solvers import eight_point

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
        cons = BatchConsensus(threshold=0.1, hypotheses=512)
        pose, mask, count = cons.model_inliers(jax.random.key(42), est, (a, b))
        assert int(count) == 11
        rel = CameraToCamera(rotation=pose.rotation, translation=pose.translation)
        points, ok = triangulate_relative(rel, a, b)
        assert int(jnp.sum(ok)) >= 10
        # World = camera A frame; P3P consensus over the triangulated
        # landmarks must localize camera B near the two-view pose.  (Real
        # noisy data: forward motion gives weak parallax, so tolerances are
        # looser than the synthetic 1e-6 checks in test_solvers_p3p_5pt.)
        sel = np.nonzero(np.asarray(ok))[0]
        wp = points[sel]
        bearings_b = b[sel]

        def _p3p_est(s):
            poses, valid = lambda_twist.estimate(s[0], s[1])
            bad = ~valid
            return Isometry3(
                rotation=jnp.where(bad[..., None, None], jnp.nan, poses.rotation),
                translation=jnp.where(bad[..., None], jnp.nan, poses.translation),
            )

        est_p3p = Estimator(
            min_samples=3,
            models_per_sample=4,
            estimate=_p3p_est,
            residual=lambda m, d: world_to_camera_residual(
                Isometry3(
                    rotation=m.rotation[..., None, :, :],
                    translation=m.translation[..., None, :],
                ),
                d[0],
                d[1],
            ),
        )
        cons_p3p = BatchConsensus(threshold=1e-6, hypotheses=256)
        model, mask2, count2 = cons_p3p.model_inliers(
            jax.random.key(5), est_p3p, (bearings_b, wp)
        )
        assert int(count2) >= 8  # most landmarks agree with the P3P pose
        rot_err = float(
            jnp.linalg.norm(
                lie.so3_log(jnp.swapaxes(model.rotation, -1, -2) @ rel.rotation)
            )
        )
        assert rot_err < 0.05, rot_err
        t_dir_est = model.translation / jnp.linalg.norm(model.translation)
        t_dir_rel = rel.translation / jnp.linalg.norm(rel.translation)
        assert float(jnp.sum(t_dir_est * t_dir_rel)) > 0.95


@pytest.mark.slow
class TestAppsSmoke:
    def test_kpdraw(self, tmp_path):
        from cv_tpu.apps.kpdraw import main

        out = tmp_path / "kp.png"
        main(["--threshold", "0.01", fixture_path("0000000000.png"), str(out)])
        assert out.exists() and out.stat().st_size > 1000

    def test_tutorials_ch2(self, tmp_path):
        from cv_tpu.apps.tutorials import chapter2_random_draw

        out = tmp_path / "ch2.png"
        chapter2_random_draw(str(out))
        assert out.exists()

    def test_vslam_sandbox_cli(self, tmp_path, monkeypatch):
        from cv_tpu.apps.vslam_sandbox import main

        monkeypatch.chdir(tmp_path)
        main(
            [
                "--x-focal", "984.2439", "--y-focal", "980.8141",
                "--x-center", "690.0", "--y-center", "233.1966",
                "--radial-distortion", "0.0",
                fixture_path("0000000000.png"),
            ]
        )
        assert (tmp_path / "vslam.cvr").exists()


class TestHostDeviceCrossChecks:
    """The engine's NumPy mirrors must agree with the device kernels."""

    def test_se3_matches_core(self, rng):
        from cv_tpu.sfm import se3

        w = rng.normal(size=3)
        t = rng.normal(size=3)
        r_host = se3.so3_exp(w)
        r_dev = np.asarray(lie.so3_exp(jnp.asarray(w)))
        assert np.allclose(r_host, r_dev, atol=1e-12)
        assert np.allclose(se3.so3_log(r_host), np.asarray(lie.so3_log(jnp.asarray(r_dev))), atol=1e-9)
        pose_h = (r_host, t)
        pose_d = Isometry3.from_parts(jnp.asarray(t), jnp.asarray(r_dev))
        assert np.allclose(se3.se3_vec(pose_h), np.asarray(pose_d.se3()), atol=1e-9)

    def test_host_triangulation_matches_device(self, rng):
        from cv_tpu.sfm import host_geom
        from cv_tpu.triangulate import triangulate_observations

        wp = rng.uniform([-1, -1, 3], [1, 1, 8], 3)
        rots = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=(3, 3)) * 0.2)))
        ts = rng.normal(size=(3, 3)) * 0.4
        poses = Isometry3.from_parts(jnp.asarray(ts), jnp.asarray(rots))
        cam = np.asarray(poses.apply(jnp.asarray(wp)))
        bearings = cam / np.linalg.norm(cam, axis=-1, keepdims=True)
        dev_pt, ok = triangulate_observations(poses, jnp.asarray(bearings))
        assert bool(ok)
        host_pt = host_geom.triangulate_observations(
            [(rots[i], ts[i]) for i in range(3)], list(bearings)
        )
        assert host_pt is not None
        assert np.allclose(np.asarray(dev_pt), host_pt, atol=1e-9)

    def test_host_epipolar_loss_matches_device(self, rng):
        from cv_tpu.geom import epipolar
        from cv_tpu.sfm import host_geom

        for _ in range(10):
            t = rng.normal(size=3)
            a = rng.normal(size=3)
            a /= np.linalg.norm(a)
            b = rng.normal(size=3)
            b /= np.linalg.norm(b)
            dev = float(epipolar.loss(jnp.asarray(t), jnp.asarray(a), jnp.asarray(b)))
            host = host_geom.epipolar_loss(t, a, b)
            assert abs(dev - host) < 1e-12
