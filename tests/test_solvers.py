"""Tests for essential matrix, eight-point, LinearEigen triangulation, and
batched consensus — ports of the reference's doc-tests and randomized tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.camera import CameraIntrinsics, essential
from cv_tpu.consensus import BatchConsensus, Estimator
from cv_tpu.core import (
    CameraToCamera,
    Isometry3,
    camera_to_camera_residual,
    lie,
    projective,
)
from cv_tpu.matching import match_descriptors
from cv_tpu.solvers import eight_point
from cv_tpu.triangulate import triangulate_observations, triangulate_relative


def synth_pose_and_bearings(rng, n, rot_mag=0.2, box=2.0, dist=3.0):
    """The reference's randomized geometry (eight-point/tests/random.rs:40-77)."""
    pose = CameraToCamera.from_parts(
        jnp.asarray(rng.uniform(0, 1, 3)),
        lie.so3_exp(jnp.asarray(rng.uniform(0, 1, 3) * 2 * np.pi * rot_mag)),
    )
    pts = rng.uniform(0, 1, (n, 3)) * box
    pts[:, 0] -= 0.5 * box
    pts[:, 1] -= 0.5 * box
    pts[:, 2] += dist
    a_h = projective.from_point(jnp.asarray(pts))
    b_h = pose.transform(a_h)
    return pose, projective.bearing(a_h), projective.bearing(b_h), pts


class TestEssential:
    def test_residual_zero_for_exact(self, rng):
        pose, a, b, _ = synth_pose_and_bearings(rng, 32)
        e = essential.essential_from_pose(pose)
        assert float(jnp.max(essential.residual(e, a, b))) < 1e-12

    def test_recondition(self, rng):
        m = jnp.asarray(rng.normal(size=(10, 3, 3)))
        r = essential.recondition(m)
        s = np.linalg.svd(np.asarray(r), compute_uv=False)
        assert np.allclose(s[:, 0], s[:, 1], atol=1e-9)
        assert np.allclose(s[:, 2], 0.0, atol=1e-9)

    def test_decomposition_recovers_pose(self, rng):
        # Port of the doc-test (essential.rs:93-113, 197-216).
        pose = CameraToCamera.from_parts(
            jnp.asarray([-0.8, 0.4, 0.5]),
            lie.so3_exp(jnp.asarray([0.2, 0.3, 0.4])),
        )
        e = essential.essential_from_pose(pose)
        poses4 = essential.possible_unscaled_poses(e)
        rot_res = jnp.linalg.norm(
            lie.so3_log(jnp.swapaxes(poses4.rotation, -1, -2) @ pose.rotation),
            axis=-1,
        )
        t_true = pose.translation / jnp.linalg.norm(pose.translation)
        t_est = poses4.translation / jnp.linalg.norm(
            poses4.translation, axis=-1, keepdims=True
        )
        t_res = 1.0 - jnp.einsum("...i,i->...", t_est, t_true)
        one_correct = jnp.any((rot_res < 1e-4) & (t_res < 1e-4))
        assert bool(one_correct)

    def test_batched_decomposition(self, rng):
        es = jnp.asarray(rng.normal(size=(7, 3, 3)))
        poses = essential.possible_unscaled_poses(es)
        assert poses.rotation.shape == (7, 4, 3, 3)
        dets = jnp.linalg.det(poses.rotation)
        assert np.allclose(np.asarray(dets), 1.0, atol=1e-9)


@pytest.mark.slow
class TestEightPoint:
    def test_randomized_statistical(self, rng):
        """Port of eight-point/tests/random.rs: 1000 rounds, 16 points,
        residuals < 1e-4 in > 95% of rounds — batched in one call."""
        rounds = 1000
        poses, aa, bb = [], [], []
        for _ in range(rounds):
            pose, a, b, _ = synth_pose_and_bearings(rng, 16)
            poses.append(pose)
            aa.append(a)
            bb.append(b)
        a = jnp.stack(aa)
        b = jnp.stack(bb)
        e = eight_point.essential_from_matches(a, b)
        res = essential.residual(e[:, None], a, b)  # (rounds, 16)
        success = jnp.sum(jnp.all(res < 1e-4, axis=-1))
        assert int(success) > 950, int(success)

    def test_estimate_shape(self, rng):
        _, a, b, _ = synth_pose_and_bearings(rng, 8)
        poses = eight_point.estimate(a, b)
        assert poses.rotation.shape == (4, 3, 3)


class TestTriangulation:
    def test_relative_doc_test(self):
        # cv-geom/src/triangulation.rs:26-38
        point = projective.from_point(jnp.asarray([0.3, 0.1, 2.0]))
        pose = CameraToCamera.from_parts(
            jnp.asarray([0.1, 0.1, 0.1]), lie.so3_exp(jnp.asarray([0.1, 0.1, 0.1]))
        )
        a = projective.bearing(point)
        b = projective.bearing(pose.transform(point))
        tri, ok = triangulate_relative(pose, a, b)
        assert bool(ok)
        d = jnp.linalg.norm(projective.point(tri) - projective.point(point))
        assert float(d) < 1e-6

    def test_multi_view(self, rng):
        # n observations of one world point from random cameras.
        wp = jnp.asarray([0.4, -0.3, 2.5])
        n = 6
        rots = lie.so3_exp(jnp.asarray(rng.normal(size=(n, 3)) * 0.2))
        ts = jnp.asarray(rng.normal(size=(n, 3)) * 0.5)
        poses = Isometry3.from_parts(ts, rots)
        cam_pts = poses.apply(wp)
        bearings = cam_pts / jnp.linalg.norm(cam_pts, axis=-1, keepdims=True)
        tri, ok = triangulate_observations(poses, bearings)
        assert bool(ok)
        assert np.allclose(np.asarray(projective.point(tri)), np.asarray(wp), atol=1e-9)

    def test_batched_with_mask(self, rng):
        # Two landmarks, second has only 2 valid of 3 observation slots.
        wps = jnp.asarray([[0.4, -0.3, 2.5], [-0.2, 0.5, 3.0]])
        rots = lie.so3_exp(jnp.asarray(rng.normal(size=(2, 3, 3)) * 0.1))
        ts = jnp.asarray(rng.normal(size=(2, 3, 3)) * 0.3)
        poses = Isometry3.from_parts(ts, rots)
        cam = poses.apply(wps[:, None, :])
        bearings = cam / jnp.linalg.norm(cam, axis=-1, keepdims=True)
        valid = jnp.asarray([[True, True, True], [True, True, False]])
        # Poison the masked observation to prove it is ignored.
        bearings = bearings.at[1, 2].set(jnp.asarray([0.0, 0.0, -1.0]))
        tri, ok = triangulate_observations(poses, bearings, valid)
        assert bool(jnp.all(ok))
        assert np.allclose(np.asarray(projective.point(tri)), np.asarray(wps), atol=1e-9)

    def test_cheirality_rejects_flipped_observation(self):
        # The reference's cheirality test (triangulation.rs:121-128) compares
        # each world-rotated observation ray with the point's direction from
        # the world origin; a sign-flipped (wrong-way) observation fails it.
        pose = CameraToCamera.from_parts(jnp.asarray([0.1, 0.0, 0.0]), jnp.eye(3))
        point = projective.from_point(jnp.asarray([0.2, -0.1, 3.0]))
        a = projective.bearing(point)
        b = -projective.bearing(pose.transform(point))
        _, ok = triangulate_relative(pose, a, b)
        assert not bool(ok)


def _eight_point_estimator():
    return Estimator(
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


@pytest.mark.slow
class TestConsensus:
    def test_outlier_rejection(self, rng):
        pose, a, b, _ = synth_pose_and_bearings(rng, 48)
        n_out = 16
        out_a = projective.bearing(
            projective.from_point(jnp.asarray(rng.normal(size=(n_out, 3)) + [0, 0, 5]))
        )
        out_b = projective.bearing(
            projective.from_point(jnp.asarray(rng.normal(size=(n_out, 3)) + [0, 0, 5]))
        )
        a_all = jnp.concatenate([a, out_a])
        b_all = jnp.concatenate([b, out_b])
        cons = BatchConsensus(threshold=1e-7, hypotheses=256)
        model, mask, count = cons.model_inliers(
            jax.random.key(0), _eight_point_estimator(), (a_all, b_all)
        )
        assert int(count) == 48
        assert bool(jnp.all(mask[:48])) and not bool(jnp.any(mask[48:]))

    def test_refit_recovers_more_inliers_on_noisy_data(self, rng):
        """The inlier-refit stage (ARRSAC block-refinement analog,
        vslam-sandbox/src/main.rs:109-116 budgets) must measurably beat the
        plain fixed-budget pass at equal total hypothesis count on noisy
        data with outliers."""
        pose, a, b, _ = synth_pose_and_bearings(rng, 96)
        # Perturb bearings with noise so minimal sets rarely produce the
        # exact model, and add outliers.
        def noisy(x, scale=2e-4):
            v = np.asarray(x) + rng.normal(size=np.asarray(x).shape) * scale
            return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))

        n_out = 64
        out_a = projective.bearing(
            projective.from_point(jnp.asarray(rng.normal(size=(n_out, 3)) + [0, 0, 5]))
        )
        out_b = projective.bearing(
            projective.from_point(jnp.asarray(rng.normal(size=(n_out, 3)) + [0, 0, 5]))
        )
        a_all = jnp.concatenate([noisy(a), out_a])
        b_all = jnp.concatenate([noisy(b), out_b])
        est = _eight_point_estimator()
        plain = BatchConsensus(threshold=1e-6, hypotheses=96)
        refit = BatchConsensus(
            threshold=1e-6, hypotheses=64, refit_rounds=2, refit_hypotheses=16
        )
        wins = even = 0
        for trial in range(5):
            key = jax.random.key(100 + trial)
            _, _, c_plain = plain.model_inliers(key, est, (a_all, b_all))
            _, _, c_refit = refit.model_inliers(key, est, (a_all, b_all))
            if int(c_refit) > int(c_plain):
                wins += 1
            elif int(c_refit) == int(c_plain):
                even += 1
        # Refit with FEWER total hypotheses should win or tie consistently.
        assert wins + even >= 4, (wins, even)
        assert wins >= 1, "refit never improved over the plain pass"

    def test_n_valid_padding(self, rng):
        pose, a, b, _ = synth_pose_and_bearings(rng, 32)
        pad = 16
        a_p = jnp.concatenate([a, jnp.zeros((pad, 3))])
        b_p = jnp.concatenate([b, jnp.zeros((pad, 3))])
        cons = BatchConsensus(threshold=1e-7, hypotheses=128)
        _, mask, count = cons.model_inliers(
            jax.random.key(1), _eight_point_estimator(), (a_p, b_p), n_valid=32
        )
        assert int(count) == 32
        assert not bool(jnp.any(mask[32:]))


@pytest.mark.slow
class TestKittiChapter5:
    def test_golden_inliers(self, kitti_features):
        """Port of akaze/tests/estimate_pose.rs:62-77: ARRSAC + eight-point
        on the 11 KITTI matches finds 11 inliers at threshold 0.1."""
        kp0, w0, kp14, w14 = kitti_features
        ia, ib = match_descriptors(w0, w14)
        assert len(ia) == 11
        intr = CameraIntrinsics.from_values(
            9.842439e2, 9.808141e2, 6.9e2, 2.331966e2
        )
        a = intr.calibrate(jnp.asarray(kp0["point"][ia], jnp.float64))
        b = intr.calibrate(jnp.asarray(kp14["point"][ib], jnp.float64))
        cons = BatchConsensus(threshold=0.1, hypotheses=512)
        model, mask, count = cons.model_inliers(
            jax.random.key(42), _eight_point_estimator(), (a, b)
        )
        assert int(count) == 11  # golden (estimate_pose.rs:75)
        # Dominant forward motion along z for this driving sequence.
        t = np.asarray(model.translation)
        assert abs(t[2]) > 0.9 * np.linalg.norm(t)
