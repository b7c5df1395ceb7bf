"""Tests for cv_tpu.core — the synthesize->invert->assert pattern of the
reference's doc-tests (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.core import (
    CameraToCamera,
    Isometry3,
    WorldToWorld,
    camera_to_camera_residual,
    lie,
    projective,
    world_to_camera_residual,
)


def random_rotation(rng, n=()):
    w = rng.normal(size=n + (3,))
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


class TestSo3:
    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3))
        r = lie.so3_exp(jnp.asarray(w))
        # Orthonormality
        eye = jnp.eye(3)
        assert jnp.max(jnp.abs(jnp.swapaxes(r, -1, -2) @ r - eye)) < 1e-12
        assert np.allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-12)
        # log(exp(w)) == w when |w| < pi
        w_small = w / (np.linalg.norm(w, axis=-1, keepdims=True) + 1.0) * 3.0
        back = lie.so3_log(lie.so3_exp(jnp.asarray(w_small)))
        assert np.allclose(np.asarray(back), w_small, atol=1e-9)

    def test_exp_small_angle(self):
        w = jnp.array([1e-12, -1e-13, 1e-12])
        r = lie.so3_exp(w)
        assert jnp.max(jnp.abs(r - jnp.eye(3))) < 1e-11
        assert not jnp.any(jnp.isnan(r))

    def test_log_identity(self):
        assert np.allclose(np.asarray(lie.so3_log(jnp.eye(3))), 0.0)

    def test_log_near_pi(self, rng):
        for axis in [
            np.array([1.0, 0, 0]),
            np.array([0, 1.0, 0]),
            np.array([0.6, -0.8, 0]),
            np.array([0.3, 0.5, -0.81])
            / np.linalg.norm([0.3, 0.5, -0.81]),
        ]:
            for theta in [np.pi - 1e-7, np.pi - 1e-3, np.pi]:
                w = axis * theta
                r = lie.so3_exp(jnp.asarray(w))
                back = np.asarray(lie.so3_log(r))
                # Recovered axis may flip sign at exactly pi.
                err = min(
                    np.linalg.norm(back - w), np.linalg.norm(back + w)
                )
                assert err < 1e-5, (axis, theta, back)

    def test_hat_vee(self, rng):
        w = jnp.asarray(rng.normal(size=(5, 3)))
        assert np.allclose(np.asarray(lie.so3_vee(lie.so3_hat(w))), np.asarray(w))
        assert np.allclose(
            np.asarray(lie.so3_hat2(w)), np.asarray(lie.so3_hat(w) @ lie.so3_hat(w))
        )

    def test_bracket_antisymmetric(self, rng):
        a = jnp.asarray(rng.normal(size=(3,)))
        b = jnp.asarray(rng.normal(size=(3,)))
        assert np.allclose(
            np.asarray(lie.so3_bracket(a, b)), -np.asarray(lie.so3_bracket(b, a))
        )
        # bracket == cross product for so(3)
        assert np.allclose(
            np.asarray(lie.so3_bracket(a, b)), np.cross(np.asarray(a), np.asarray(b))
        )


class TestProjective:
    def test_from_point_roundtrip(self, rng):
        p = rng.normal(size=(32, 3)) * 10.0
        hp = projective.from_point(jnp.asarray(p))
        # invariant: unit xyz, non-negative w
        assert np.allclose(np.linalg.norm(np.asarray(hp[..., :3]), axis=-1), 1.0)
        assert np.all(np.asarray(hp[..., 3]) >= 0)
        assert np.allclose(np.asarray(projective.point(hp)), p, atol=1e-12)

    def test_negative_w_flip(self):
        hp = projective.from_homogeneous(jnp.array([1.0, 2.0, 2.0, -3.0]))
        assert hp[3] > 0
        assert np.allclose(np.asarray(projective.point(hp)), [-1 / 3, -2 / 3, -2 / 3])


class TestIsometry:
    def test_compose_inverse(self, rng):
        r1, r2 = random_rotation(rng), random_rotation(rng)
        t1, t2 = rng.normal(size=3), rng.normal(size=3)
        a = Isometry3.from_parts(jnp.asarray(t1), jnp.asarray(r1))
        b = Isometry3.from_parts(jnp.asarray(t2), jnp.asarray(r2))
        p = rng.normal(size=(7, 3))
        lhs = (a @ b).apply(jnp.asarray(p))
        rhs = a.apply(b.apply(jnp.asarray(p)))
        assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)
        ident = a @ a.inverse()
        assert np.allclose(np.asarray(ident.rotation), np.eye(3), atol=1e-12)
        assert np.allclose(np.asarray(ident.translation), 0.0, atol=1e-12)

    def test_se3_roundtrip(self, rng):
        r = random_rotation(rng)
        t = rng.normal(size=3)
        pose = Isometry3.from_parts(jnp.asarray(t), jnp.asarray(r))
        back = Isometry3.from_se3(pose.se3())
        assert np.allclose(np.asarray(back.rotation), r, atol=1e-9)
        assert np.allclose(np.asarray(back.translation), t, atol=1e-12)

    def test_projective_transform_matches_euclidean(self, rng):
        r = random_rotation(rng)
        t = rng.normal(size=3)
        pose = Isometry3.from_parts(jnp.asarray(t), jnp.asarray(r))
        p = rng.normal(size=(5, 3)) + np.array([0, 0, 5.0])
        hp = projective.from_point(jnp.asarray(p))
        out = projective.point(pose.transform(hp))
        assert np.allclose(np.asarray(out), np.asarray(pose.apply(jnp.asarray(p))), atol=1e-10)

    def test_transform_jacobian_input_matches_autodiff(self, rng):
        r = random_rotation(rng)
        t = rng.normal(size=3)
        pose = Isometry3.from_parts(jnp.asarray(t), jnp.asarray(r))
        hp = projective.from_point(jnp.asarray(rng.normal(size=3) + [0, 0, 4.0]))
        _, jac_in, _ = pose.transform_jacobians(hp)
        auto = jax.jacobian(lambda x: pose.transform_unnormalized(x))(hp)
        assert np.allclose(np.asarray(jac_in), np.asarray(auto), atol=1e-10)

    def test_world_to_world_from_camera_poses(self, rng):
        # A camera with poses in two reconstructions defines the A->B map.
        pa = Isometry3.from_parts(jnp.asarray(rng.normal(size=3)), jnp.asarray(random_rotation(rng)))
        pb = Isometry3.from_parts(jnp.asarray(rng.normal(size=3)), jnp.asarray(random_rotation(rng)))
        ab = WorldToWorld.from_camera_poses(pa, pb)
        # world point seen by camera: pa @ x_worldA == pb @ (ab @ x_worldA)
        x = projective.from_point(jnp.asarray(rng.normal(size=3)))
        lhs = pa.transform(x)
        rhs = pb.transform(ab.transform(x))
        assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)

    def test_batched(self, rng):
        rs = random_rotation(rng, (10,))
        ts = rng.normal(size=(10, 3))
        poses = Isometry3.from_parts(jnp.asarray(ts), jnp.asarray(rs))
        ps = rng.normal(size=(10, 3))
        out = poses.apply(jnp.asarray(ps))
        for i in range(10):
            assert np.allclose(np.asarray(out[i]), rs[i] @ ps[i] + ts[i], atol=1e-12)


class TestResiduals:
    def test_world_to_camera_residual_zero_for_exact(self, rng):
        pose = Isometry3.from_parts(
            jnp.asarray(rng.normal(size=3)), jnp.asarray(random_rotation(rng))
        )
        world = projective.from_point(jnp.asarray(rng.normal(size=(16, 3)) * 2.0))
        bearings = projective.bearing(pose.transform(world))
        res = world_to_camera_residual(pose, bearings, world)
        assert np.max(np.abs(np.asarray(res))) < 1e-12

    def test_camera_to_camera_residual_zero_for_exact(self, rng):
        pose = CameraToCamera.from_parts(
            jnp.asarray(rng.normal(size=3) * 0.3), jnp.asarray(random_rotation(rng))
        )
        pts = rng.normal(size=(8, 3)) * 0.5 + np.array([0, 0, 6.0])
        a_pts = projective.from_point(jnp.asarray(pts))
        b_pts = pose.transform(a_pts)
        res = camera_to_camera_residual(
            pose, projective.bearing(a_pts), projective.bearing(b_pts)
        )
        assert np.max(np.abs(np.asarray(res))) < 1e-9

    def test_camera_to_camera_residual_large_for_wrong(self, rng):
        pose = CameraToCamera.from_parts(
            jnp.asarray([0.5, 0.0, 0.0]), jnp.asarray(np.eye(3))
        )
        # Behind-camera observation must be penalized (cheirality).
        a = jnp.asarray([[0.0, 0.0, 1.0]])
        b = jnp.asarray([[0.0, 0.0, -1.0]])
        res = camera_to_camera_residual(pose, a, b)
        assert np.asarray(res)[0] > 0.5


class TestJit:
    def test_core_ops_jit(self, rng):
        @jax.jit
        def fn(w, t, p):
            pose = Isometry3.from_tangent(t, w)
            return pose.apply(p)

        out = fn(
            jnp.asarray(rng.normal(size=3)),
            jnp.asarray(rng.normal(size=3)),
            jnp.asarray(rng.normal(size=(4, 3))),
        )
        assert out.shape == (4, 3)
