"""Tests for cv_tpu.geom.epipolar, the triangulator family, and optimizers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu import optimize as opt
from cv_tpu import triangulate as tri
from cv_tpu.core import (
    CameraToCamera,
    Isometry3,
    WorldToCamera,
    lie,
    projective,
    world_to_camera_residual,
)
from cv_tpu.geom import epipolar


def doc_pose_and_point():
    point = projective.from_point(jnp.asarray([0.3, 0.1, 2.0]))
    pose = CameraToCamera.from_parts(
        jnp.asarray([0.1, 0.1, 0.1]), lie.so3_exp(jnp.asarray([0.1, 0.1, 0.1]))
    )
    a = projective.bearing(point)
    b = projective.bearing(pose.transform(point))
    return pose, point, a, b


def as_observations(pose, a, b):
    eye = Isometry3.identity()
    poses = Isometry3(
        rotation=jnp.stack([eye.rotation, pose.rotation]),
        translation=jnp.stack([eye.translation, pose.translation]),
    )
    return poses, jnp.stack([a, b])


class TestEpipolar:
    def test_loss_zero_for_exact(self, rng):
        pose, point, a, b = doc_pose_and_point()
        # translation from b's camera to a's camera in a's frame is -inv t...
        # the loss takes the translation between cameras in a shared frame.
        t = pose.inverse().translation
        b_in_a = pose.inverse().rotate(b)
        assert float(epipolar.loss(t, a, b_in_a)) < 1e-9

    def test_loss_one_for_nan_or_cheirality(self):
        a = jnp.asarray([0.0, 0.0, 1.0])
        b = jnp.asarray([0.0, 0.0, -1.0])
        t = jnp.asarray([1.0, 0.0, 0.0])
        assert float(epipolar.loss(t, a, b)) == 1.0  # opposite bearings
        t0 = jnp.zeros(3)
        assert float(epipolar.loss(t0, a, a)) == 1.0  # NaN fallback

    def test_point_gradient_zero_on_ray(self):
        b = jnp.asarray([0.0, 0.0, 1.0])
        assert np.allclose(
            np.asarray(epipolar.point_gradient(jnp.asarray([0.0, 0.0, 5.0]), b)), 0.0
        )
        g = epipolar.point_gradient(jnp.asarray([1.0, 0.0, 5.0]), b)
        assert np.allclose(np.asarray(g), [1.0, 0.0, 0.0])

    def test_world_pose_gradient_zero_for_exact(self):
        t = jnp.asarray([0.3, -0.2, 4.0])
        b = t / jnp.linalg.norm(t)
        gt, gr = epipolar.world_pose_gradient(t, b)
        assert np.allclose(np.asarray(gt), 0.0, atol=1e-12)
        assert np.allclose(np.asarray(gr), 0.0, atol=1e-12)

    def test_three_view_gradients_zero_for_exact(self, rng):
        # Exact three-view geometry must produce (near) zero tangents.
        p1 = CameraToCamera.from_parts(
            jnp.asarray([0.5, 0.05, 0.1]), lie.so3_exp(jnp.asarray([0.02, 0.1, 0.0]))
        )
        p2 = CameraToCamera.from_parts(
            jnp.asarray([-0.3, 0.4, 0.05]),
            lie.so3_exp(jnp.asarray([-0.05, 0.03, 0.08])),
        )
        pts = projective.from_point(jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 8], (32, 3))))
        c = projective.bearing(pts)
        f_cam = p1.transform(pts)
        s_cam = p2.transform(pts)
        ftoc = p1.inverse()
        stoc = p2.inverse()
        (t1, r1), (t2, r2) = epipolar.three_view_gradients(
            c,
            ftoc.rotate(projective.bearing(f_cam)),
            jnp.broadcast_to(ftoc.translation, (32, 3)),
            stoc.rotate(projective.bearing(s_cam)),
            jnp.broadcast_to(stoc.translation, (32, 3)),
        )
        for g in (t1, r1, t2, r2):
            assert float(jnp.max(jnp.abs(g))) < 1e-9


class TestTriangulators:
    def test_doc_tolerances(self):
        """Each triangulator recovers the doc-test point within its published
        tolerance (triangulation.rs doc-tests)."""
        pose, point, a, b = doc_pose_and_point()
        true = np.asarray([0.3, 0.1, 2.0])
        poses, bearings = as_observations(pose, a, b)

        cases = {
            "sine_l1": (tri.sine_l1(poses, bearings), 1e-6),
            "relative_dlt": (tri.relative_dlt(pose, a, b), 1e-6),
            "mean_mean": (tri.mean_mean(poses, bearings), 1e-2),
            "angular_l1": (tri.angular_l1(pose, a, b), 1e-6),
            "angular_linf": (tri.angular_linf(pose, a, b), 1e-6),
        }
        for name, ((pt, ok), tol) in cases.items():
            assert bool(ok), name
            err = np.linalg.norm(np.asarray(projective.point(pt)) - true)
            assert err < tol, (name, err)

    def test_batched(self, rng):
        n = 16
        pose = CameraToCamera.from_parts(
            jnp.asarray([0.1, 0.1, 0.1]), lie.so3_exp(jnp.asarray([0.1, 0.1, 0.1]))
        )
        pts = rng.uniform([-1, -1, 1.5], [1, 1, 6], (n, 3))
        hp = projective.from_point(jnp.asarray(pts))
        a = projective.bearing(hp)
        b = projective.bearing(pose.transform(hp))
        for fn in (tri.relative_dlt, tri.angular_l1, tri.angular_linf):
            out, ok = fn(pose, a, b)
            assert bool(jnp.all(ok))
            assert np.allclose(np.asarray(projective.point(out)), pts, atol=1e-6)

    def test_flipped_observation_rejected(self):
        pose, point, a, b = doc_pose_and_point()
        _, ok = tri.angular_l1(pose, a, -b)
        assert not bool(ok)


class TestOptimizers:
    def _setup_single(self, rng, n=64):
        true = WorldToCamera.from_parts(
            jnp.asarray([0.2, -0.1, 0.4]), lie.so3_exp(jnp.asarray([0.1, -0.2, 0.15]))
        )
        wps = projective.from_point(
            jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 8], (n, 3)))
        )
        bearings = projective.bearing(true.transform(wps))
        init = WorldToCamera.from_parts(
            true.translation + jnp.asarray([0.05, -0.03, 0.04]),
            lie.so3_exp(jnp.asarray([0.02, 0.01, -0.02])) @ true.rotation,
        )
        return true, init, wps, bearings, jnp.ones(n, bool)

    def test_single_view_l2_reduces_objective(self, rng):
        true, init, wps, bearings, valid = self._setup_single(rng)

        def obj(p):
            return float(jnp.mean(world_to_camera_residual(p, bearings, wps)))

        out = opt.single_view_simple_optimize_l2(init, bearings, wps, valid, 1e-2, 4000)
        assert obj(out) < 0.1 * obj(init)

    def test_single_view_l1_reduces_objective(self, rng):
        true, init, wps, bearings, valid = self._setup_single(rng)

        def obj(p):
            return float(jnp.mean(world_to_camera_residual(p, bearings, wps)))

        out = opt.single_view_simple_optimize_l1(
            init, bearings, wps, valid, 1e-9, 1e-2, 4000
        )
        assert obj(out) < 0.1 * obj(init)

    def test_single_view_exact_pose_is_stable(self, rng):
        true, _, wps, bearings, valid = self._setup_single(rng)
        out = opt.single_view_simple_optimize_l2(true, bearings, wps, valid, 1e-2, 500)
        # Starting from the exact pose, patience stops quickly and the pose
        # barely moves.
        assert float(jnp.linalg.norm(out.translation - true.translation)) < 1e-6

    def test_three_view_reduces_epipolar_loss(self, rng):
        p1 = CameraToCamera.from_parts(
            jnp.asarray([0.5, 0.05, 0.1]), lie.so3_exp(jnp.asarray([0.02, 0.1, 0.0]))
        )
        p2 = CameraToCamera.from_parts(
            jnp.asarray([-0.3, 0.4, 0.05]),
            lie.so3_exp(jnp.asarray([-0.05, 0.03, 0.08])),
        )
        pts = projective.from_point(
            jnp.asarray(rng.uniform([-2, -2, 3], [2, 2, 9], (128, 3)))
        )
        obs = jnp.stack(
            [
                projective.bearing(pts),
                projective.bearing(p1.transform(pts)),
                projective.bearing(p2.transform(pts)),
            ],
            axis=1,
        )
        valid = jnp.ones(128, bool)
        p1n = CameraToCamera.from_parts(
            p1.translation + jnp.asarray([0.02, -0.01, 0.015]),
            lie.so3_exp(jnp.asarray([0.01, -0.008, 0.012])) @ p1.rotation,
        )
        p2n = CameraToCamera.from_parts(
            p2.translation + jnp.asarray([-0.015, 0.02, -0.01]),
            lie.so3_exp(jnp.asarray([-0.01, 0.006, 0.009])) @ p2.rotation,
        )

        def total_loss(q1, q2):
            i1, i2 = q1.inverse(), q2.inverse()
            l1 = epipolar.loss(
                jnp.broadcast_to(i1.translation, (128, 3)),
                obs[:, 0],
                i1.rotate(obs[:, 1]),
            )
            l2 = epipolar.loss(
                jnp.broadcast_to(i2.translation, (128, 3)),
                obs[:, 0],
                i2.rotate(obs[:, 2]),
            )
            return float(jnp.mean(l1) + jnp.mean(l2))

        before = total_loss(p1n, p2n)
        o1, o2 = opt.three_view_simple_optimize_l2((p1n, p2n), obs, valid, 1e-2, 4000)
        after = total_loss(o1, o2)
        assert after < 0.3 * before, (before, after)

        o1a, o2a = opt.three_view_adaptive_optimize_l2((p1n, p2n), obs, valid, 2000)
        assert total_loss(o1a, o2a) < 0.3 * before

    def test_three_view_l1_runs(self, rng):
        p1 = CameraToCamera.from_parts(
            jnp.asarray([0.5, 0.0, 0.1]), lie.so3_exp(jnp.asarray([0.0, 0.1, 0.0]))
        )
        p2 = CameraToCamera.from_parts(
            jnp.asarray([-0.3, 0.4, 0.0]), lie.so3_exp(jnp.asarray([0.0, 0.0, 0.08]))
        )
        pts = projective.from_point(
            jnp.asarray(rng.uniform([-2, -2, 3], [2, 2, 9], (32, 3)))
        )
        obs = jnp.stack(
            [
                projective.bearing(pts),
                projective.bearing(p1.transform(pts)),
                projective.bearing(p2.transform(pts)),
            ],
            axis=1,
        )
        o1, o2 = opt.three_view_simple_optimize_l1(
            (p1, p2), obs, jnp.ones(32, bool), 1e-9, 1e-2, 200
        )
        assert bool(jnp.all(jnp.isfinite(o1.rotation)))
        assert bool(jnp.all(jnp.isfinite(o2.rotation)))


class TestLevenbergMarquardt:
    """cv::optimize::lm facade parity (cv/src/lib.rs:124-129): general
    nonlinear least squares with autodiff or supplied Jacobians."""

    def test_exponential_fit(self):
        t = jnp.linspace(0.0, 2.0, 32)
        y = 1.7 * jnp.exp(-0.9 * t)

        def resid(p):
            return p[0] * jnp.exp(p[1] * t) - y

        out = opt.levenberg_marquardt(resid, jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(
            np.asarray(out.x), [1.7, -0.9], atol=1e-5
        )
        assert bool(out.converged)
        assert float(out.cost) < 1e-10

    def test_rosenbrock_valley(self):
        def resid(p):
            return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

        out = opt.levenberg_marquardt(
            resid, jnp.asarray([-1.2, 1.0]), max_iterations=200
        )
        np.testing.assert_allclose(np.asarray(out.x), [1.0, 1.0], atol=1e-5)

    def test_supplied_jacobian_matches_autodiff(self):
        t = jnp.linspace(0.0, 1.0, 16)
        y = 0.5 * t + 2.0

        def resid(p):
            return p[0] * t + p[1] - y

        def jac(p):
            return jnp.stack([t, jnp.ones_like(t)], axis=-1)

        a = opt.levenberg_marquardt(resid, jnp.zeros(2))
        b = opt.levenberg_marquardt(resid, jnp.zeros(2), jacobian=jac)
        np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-7)
        np.testing.assert_allclose(np.asarray(a.x), [0.5, 2.0], atol=1e-5)

    def test_vmap_and_jit_batched_problems(self):
        t = jnp.linspace(0.0, 1.0, 24)
        slopes = jnp.asarray([0.3, -1.1, 2.2, 0.0])

        def solve_one(slope):
            def resid(p):
                return p[0] * t + p[1] - (slope * t + 0.25)

            return opt.levenberg_marquardt(resid, jnp.zeros(2)).x

        xs = jax.jit(jax.vmap(solve_one))(slopes)
        np.testing.assert_allclose(np.asarray(xs[:, 0]), np.asarray(slopes), atol=1e-5)
        np.testing.assert_allclose(np.asarray(xs[:, 1]), 0.25, atol=1e-5)

    def test_max_iterations_bounds_work(self):
        def resid(p):
            return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

        out = opt.levenberg_marquardt(
            resid, jnp.asarray([-1.2, 1.0]), max_iterations=3
        )
        assert int(out.iterations) <= 3
        assert not bool(out.converged)
