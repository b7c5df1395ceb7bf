"""Tests for cv_tpu.camera — ports of the reference doc-tests
(cv-pinhole/src/lib.rs:91-133, 169-223)."""

import jax.numpy as jnp
import numpy as np

from cv_tpu.camera import (
    CameraIntrinsics,
    CameraIntrinsicsK1Distortion,
)


def make_intrinsics():
    # Same values as the reference doc-tests.
    return CameraIntrinsics.from_values(800.0, 900.0, 500.0, 600.0, skew=1.7)


class TestCameraIntrinsics:
    def test_calibrate_matches_k_matrix(self):
        intr = make_intrinsics()
        kp = jnp.array([471.0, 322.0])
        bearing = intr.calibrate(kp)
        k = np.asarray(intr.matrix())
        proj = k @ (np.asarray(bearing) / np.asarray(bearing)[2])
        uncal = proj[:2] / proj[2]
        assert np.linalg.norm(np.asarray(kp) - uncal) < 0.1

    def test_uncalibrate_roundtrip(self):
        intr = make_intrinsics()
        kp = jnp.array([471.0, 322.0])
        ukp, valid = intr.uncalibrate(intr.calibrate(kp))
        assert bool(valid)
        assert np.linalg.norm(np.asarray(kp) - np.asarray(ukp)) < 1e-6

    def test_uncalibrate_rejects_behind_camera(self):
        intr = make_intrinsics()
        _, valid = intr.uncalibrate(jnp.array([0.0, 0.0, -1.0]))
        assert not bool(valid)

    def test_batched_roundtrip(self, rng):
        intr = make_intrinsics()
        kps = jnp.asarray(rng.uniform(0, 1000, size=(128, 2)))
        ukps, valid = intr.uncalibrate(intr.calibrate(kps))
        assert np.all(np.asarray(valid))
        assert np.max(np.linalg.norm(np.asarray(ukps - kps), axis=-1)) < 1e-6


class TestK1Distortion:
    def test_calibrate_matches_distortion_model(self):
        k1 = -0.164624
        intr = CameraIntrinsicsK1Distortion.new(make_intrinsics(), k1)
        kp = jnp.array([471.0, 322.0])
        nkp = np.asarray(intr.calibrate(kp))
        nkp = nkp[:2] / nkp[2]
        simple = np.asarray(intr.simple_intrinsics.calibrate(kp))
        simple = simple[:2] / simple[2]
        expected = simple / (1.0 + k1 * (simple @ simple))
        assert np.linalg.norm(nkp - expected) < 0.1

    def test_uncalibrate_roundtrip(self):
        intr = CameraIntrinsicsK1Distortion.new(make_intrinsics(), -0.164624)
        kp = jnp.array([471.0, 322.0])
        ukp, valid = intr.uncalibrate(intr.calibrate(kp))
        assert bool(valid)
        assert np.linalg.norm(np.asarray(kp) - np.asarray(ukp)) < 1e-6

    def test_zero_k1_same_as_simple(self, rng):
        intr0 = CameraIntrinsicsK1Distortion.new(make_intrinsics(), 0.0)
        kps = jnp.asarray(rng.uniform(0, 1000, size=(16, 2)))
        b0 = intr0.calibrate(kps)
        b1 = intr0.simple_intrinsics.calibrate(kps)
        assert np.allclose(np.asarray(b0), np.asarray(b1), atol=1e-12)
        ukp, _ = intr0.uncalibrate(b0)
        assert np.allclose(np.asarray(ukp), np.asarray(kps), atol=1e-8)

    def test_kitti_intrinsics(self):
        # K_00 from res/calib_cam_to_cam.txt, as used by the tutorials.
        intr = CameraIntrinsics.from_values(
            9.842439e02, 9.808141e02, 6.900000e02, 2.331966e02
        )
        kp = jnp.array([100.0, 200.0])
        ukp, valid = intr.uncalibrate(intr.calibrate(kp))
        assert bool(valid)
        assert np.linalg.norm(np.asarray(kp) - np.asarray(ukp)) < 1e-6


class TestReprojectionError:
    def test_zero_for_exact_geometry(self):
        """Port of the doc-test (cv-pinhole/src/lib.rs:292-313, 344-364)."""
        import jax.numpy as jnp
        import numpy as np

        from cv_tpu.camera.pinhole import (
            average_pose_reprojection_error,
            pose_reprojection_error,
        )
        from cv_tpu.core import CameraToCamera, projective

        point_a = projective.from_point(jnp.asarray([0.4, -0.25, 5.0]))
        pose = CameraToCamera.from_parts(jnp.asarray([0.1, 0.2, -0.5]), jnp.eye(3))
        point_b = pose.transform(point_a)
        a = projective.bearing(point_a)
        b = projective.bearing(point_b)
        errors, ok = pose_reprojection_error(pose, a, b)
        assert bool(ok)
        avg, ok2 = average_pose_reprojection_error(pose, a, b)
        assert bool(ok2) and float(avg) < 1e-6
