"""Interpret-mode parity gates for the resident patience-loop kernels
(cv_tpu/optimize/pallas_loop.py) against their XLA loop counterparts.

The kernels replicate the step math operation-for-operation; accumulated
float rounding over thousands of chained steps still drifts, so the gates
are: bit-level agreement after ONE step, and convergence to the same pose
within 1e-4 after a full patience run (both optimizers reach the same
stationary point).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.core import lie
from cv_tpu.core.pose import CameraToCamera, WorldToCamera
from cv_tpu.optimize import (
    single_view_simple_optimize_l2,
    three_view_adaptive_optimize_l2,
)
from cv_tpu.optimize.pallas_loop import (
    single_view_l2_resident,
    three_view_adaptive_resident,
)


def _single_view_problem(m=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (m, 3)).astype(np.float32)
    wp = np.concatenate([pts, np.ones((m, 1), np.float32)], axis=1)
    rot = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.04], jnp.float32)))
    t = np.asarray([0.3, -0.1, 0.05], np.float32)
    cam = pts @ rot.T + t
    bear = cam / np.linalg.norm(cam, axis=1, keepdims=True)
    rot_p = np.asarray(lie.so3_exp(jnp.asarray([0.08, -0.07, 0.06], jnp.float32)))
    pose = WorldToCamera(
        rotation=jnp.asarray(rot_p, jnp.float32),
        translation=jnp.asarray(t + 0.05, jnp.float32),
    )
    valid = np.ones(m, bool)
    valid[m // 2:] = False
    return pose, jnp.asarray(bear), jnp.asarray(wp), jnp.asarray(valid)


def _three_view_problem(n=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    obs = np.zeros((n, 3, 3), np.float32)
    poses = []
    for i, tvec in enumerate(([0, 0, 0], [0.4, 0, 0.05], [0.8, 0.05, 0.1])):
        rot = np.asarray(
            lie.so3_exp(jnp.asarray(np.float32([0.02, -0.03, 0.01]) * i))
        )
        cam = (pts - np.float32(tvec)) @ rot.T
        obs[:, i] = cam / np.linalg.norm(cam, axis=1, keepdims=True)
        poses.append((rot, -rot @ np.float32(tvec)))
    p1 = CameraToCamera(
        rotation=jnp.asarray(poses[1][0], jnp.float32),
        translation=jnp.asarray(poses[1][1] + 0.03, jnp.float32),
    )
    p2 = CameraToCamera(
        rotation=jnp.asarray(poses[2][0], jnp.float32),
        translation=jnp.asarray(poses[2][1] - 0.02, jnp.float32),
    )
    return (p1, p2), jnp.asarray(obs), jnp.ones(n, bool)


class TestSingleViewResident:
    @pytest.mark.parametrize("iters,tol", [(1, 1e-6), (2000, 1e-4)])
    def test_matches_xla_loop(self, iters, tol):
        pose, bear, wp, valid = _single_view_problem()
        ref = single_view_simple_optimize_l2(pose, bear, wp, valid, 1e-2, iters)
        out = single_view_l2_resident(
            pose, bear, wp, valid, 1e-2, iters, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(ref.rotation, np.float32),
            np.asarray(out.rotation, np.float32),
            atol=tol, rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(ref.translation, np.float32),
            np.asarray(out.translation, np.float32),
            atol=tol, rtol=0,
        )

    def test_padding_invariance(self):
        """Extra invalid rows (lane padding) must not change the result."""
        pose, bear, wp, valid = _single_view_problem(m=100)
        out_a = single_view_l2_resident(
            pose, bear, wp, valid, 1e-2, 300, interpret=True
        )
        pad = 60
        out_b = single_view_l2_resident(
            pose,
            jnp.pad(bear, ((0, pad), (0, 0)), constant_values=0.5),
            jnp.pad(wp, ((0, pad), (0, 0)), constant_values=1.0),
            jnp.pad(valid, (0, pad)),
            1e-2, 300, interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(out_a.rotation), np.asarray(out_b.rotation)
        )

    def test_preserves_pose_type(self):
        pose, bear, wp, valid = _single_view_problem()
        out = single_view_l2_resident(
            pose, bear, wp, valid, 1e-2, 10, interpret=True
        )
        assert isinstance(out, WorldToCamera)


class TestThreeViewResident:
    def test_matches_xla_adaptive(self):
        (p1, p2), obs, valid = _three_view_problem()
        iters = 200
        ref1, ref2 = three_view_adaptive_optimize_l2((p1, p2), obs, valid, iters)
        i1, i2 = p1.inverse(), p2.inverse()
        k = 3
        o1r, o1t, o2r, o2t = three_view_adaptive_resident(
            jnp.stack([i1.rotation] * k), jnp.stack([i1.translation] * k),
            jnp.stack([i2.rotation] * k), jnp.stack([i2.translation] * k),
            jnp.stack([obs] * k), jnp.stack([valid] * k),
            iters, interpret=True,
        )
        # Identical problems across the grid -> identical outputs.
        np.testing.assert_array_equal(np.asarray(o1r[0]), np.asarray(o1r[2]))
        out1 = CameraToCamera(rotation=o1r[0], translation=o1t[0]).inverse()
        out2 = CameraToCamera(rotation=o2r[0], translation=o2t[0]).inverse()
        for ref, out in ((ref1, out1), (ref2, out2)):
            np.testing.assert_allclose(
                np.asarray(ref.rotation, np.float32),
                np.asarray(out.rotation, np.float32),
                atol=1e-5, rtol=0,
            )
            np.testing.assert_allclose(
                np.asarray(ref.translation, np.float32),
                np.asarray(out.translation, np.float32),
                atol=1e-5, rtol=0,
            )

    def test_distinct_problems_stay_distinct(self):
        (p1, p2), obs, valid = _three_view_problem(seed=1)
        (q1, q2), obs2, _ = _three_view_problem(seed=2)
        i1, i2 = p1.inverse(), p2.inverse()
        j1, j2 = q1.inverse(), q2.inverse()
        o1r, _, _, _ = three_view_adaptive_resident(
            jnp.stack([i1.rotation, j1.rotation]),
            jnp.stack([i1.translation, j1.translation]),
            jnp.stack([i2.rotation, j2.rotation]),
            jnp.stack([i2.translation, j2.translation]),
            jnp.stack([obs, obs2]), jnp.stack([valid, valid]),
            50, interpret=True,
        )
        assert not np.array_equal(np.asarray(o1r[0]), np.asarray(o1r[1]))


class TestThreeViewL2Resident:
    def test_matches_xla_patience_loop(self):
        from cv_tpu.optimize import three_view_simple_optimize_l2
        from cv_tpu.optimize.pallas_loop import three_view_l2_resident

        (p1, p2), obs, valid = _three_view_problem()
        iters = 500
        ref1, ref2 = three_view_simple_optimize_l2(
            (p1, p2), obs, valid, 1e-2, iters
        )
        i1, i2 = p1.inverse(), p2.inverse()
        o1r, o1t, o2r, o2t = three_view_l2_resident(
            i1.rotation, i1.translation, i2.rotation, i2.translation,
            obs, valid, 1e-2, iters, interpret=True,
        )
        out1 = CameraToCamera(rotation=o1r, translation=o1t).inverse()
        out2 = CameraToCamera(rotation=o2r, translation=o2t).inverse()
        for ref, out in ((ref1, out1), (ref2, out2)):
            np.testing.assert_allclose(
                np.asarray(ref.rotation, np.float32),
                np.asarray(out.rotation, np.float32),
                atol=1e-4, rtol=0,
            )
            np.testing.assert_allclose(
                np.asarray(ref.translation, np.float32),
                np.asarray(out.translation, np.float32),
                atol=1e-4, rtol=0,
            )
