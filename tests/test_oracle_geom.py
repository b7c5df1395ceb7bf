"""Pin cv_tpu two-view geometry VALUES against the NumPy reference oracle.

BASELINE.md requires poses "within 1e-4 of the Rust reference".  Inlier
counts and motion-direction checks (test_pipelines.py) exercise behavior;
these tests gate the actual numbers: essential matrices, decomposed
rotations/translations, and triangulated points from cv_tpu must match the
line-faithful oracle (tests/oracle_geom.py) at 1e-4 on BOTH synthetic
problems and the real KITTI golden matches.

All comparisons run on CPU x64 (conftest forces the platform); the TPU f32
path is covered by the pipeline/golden tests.
"""

import numpy as np
import pytest

import oracle_geom as oracle


def _synthetic_two_view(n=8, seed=0, noise=0.0):
    """Ground-truth CameraToCamera problem: a-frame bearings + b-frame
    bearings relating by (rot, t)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    angle_axis = np.array([0.08, -0.05, 0.03])
    theta = np.linalg.norm(angle_axis)
    k = angle_axis / theta
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    rot = np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * (kx @ kx)
    t = np.array([0.4, -0.15, 0.1])
    a_pts = pts
    b_pts = pts @ rot.T + t
    if noise:
        a_pts = a_pts + rng.normal(scale=noise, size=a_pts.shape)
        b_pts = b_pts + rng.normal(scale=noise, size=b_pts.shape)
    a = a_pts / np.linalg.norm(a_pts, axis=1, keepdims=True)
    b = b_pts / np.linalg.norm(b_pts, axis=1, keepdims=True)
    return a, b, rot, t


def _norm_e(e):
    """Quotient an essential matrix to unit Frobenius norm with a canonical
    sign (largest-|entry| positive)."""
    e = e / np.linalg.norm(e)
    flat = e.ravel()
    lead = flat[np.argmax(np.abs(flat))]
    return e * np.sign(lead)


def _pose_close(rot_a, t_a, rot_b, t_b, tol=1e-4):
    ta = t_a / np.linalg.norm(t_a)
    tb = t_b / np.linalg.norm(t_b)
    return (
        np.max(np.abs(np.asarray(rot_a) - rot_b)) < tol
        and np.max(np.abs(ta - tb)) < tol
    )


class TestEightPointOracle:
    def test_essential_matches_oracle_synthetic(self):
        import jax.numpy as jnp

        from cv_tpu.solvers import eight_point

        a, b, _, _ = _synthetic_two_view()
        e_oracle = oracle.eight_point_essential(a, b)
        e_ours = np.asarray(
            eight_point.essential_from_matches(jnp.asarray(a), jnp.asarray(b))
        )
        assert np.max(np.abs(_norm_e(e_ours) - _norm_e(e_oracle))) < 1e-6

    def test_poses_match_oracle_synthetic(self):
        import jax.numpy as jnp

        from cv_tpu.solvers import eight_point

        a, b, rot_true, t_true = _synthetic_two_view()
        e_oracle = oracle.eight_point_essential(a, b)
        oracle_poses = oracle.possible_unscaled_poses(e_oracle)
        # The oracle's 4 candidates contain the TRUE motion (doc-test
        # parity, essential.rs:218-233).
        assert any(
            _pose_close(r, t, rot_true, t_true) for r, t in oracle_poses
        )
        ours = eight_point.estimate(jnp.asarray(a), jnp.asarray(b))
        ours_r = np.asarray(ours.rotation)
        ours_t = np.asarray(ours.translation)
        # Every cv_tpu pose equals some oracle pose at 1e-4 and vice versa.
        for i in range(4):
            assert any(
                _pose_close(ours_r[i], ours_t[i], r, t) for r, t in oracle_poses
            ), i
        for r, t in oracle_poses:
            assert any(
                _pose_close(ours_r[i], ours_t[i], r, t) for i in range(4)
            )

    def test_recondition_matches_oracle(self):
        import jax.numpy as jnp

        from cv_tpu.camera import essential as ours

        a, b, _, _ = _synthetic_two_view(noise=1e-3, seed=3)
        e = oracle.eight_point_essential(a, b)
        r_oracle = oracle.recondition(e)
        r_ours = np.asarray(ours.recondition(jnp.asarray(e)))
        assert np.max(np.abs(_norm_e(r_ours) - _norm_e(r_oracle))) < 1e-6

    def test_essential_from_pose_matches_oracle(self):
        import jax.numpy as jnp

        from cv_tpu.camera import essential as ours
        from cv_tpu.core import Isometry3

        _, _, rot, t = _synthetic_two_view()
        e_oracle = oracle.essential_from_pose(rot, t)
        e_ours = np.asarray(
            ours.essential_from_pose(
                Isometry3(rotation=jnp.asarray(rot), translation=jnp.asarray(t))
            )
        )
        assert np.max(np.abs(e_ours - e_oracle)) < 1e-10


class TestLinearEigenOracle:
    def test_triangulation_matches_oracle(self):
        import jax.numpy as jnp

        from cv_tpu.core import Isometry3
        from cv_tpu.triangulate import linear_eigen

        a, b, rot, t = _synthetic_two_view(n=16, seed=5, noise=5e-4)
        poses_np = [(np.eye(3), np.zeros(3)), (rot, t)]
        poses = Isometry3(
            rotation=jnp.asarray(np.stack([p[0] for p in poses_np]))[None],
            translation=jnp.asarray(np.stack([p[1] for p in poses_np]))[None],
        )
        for i in range(16):
            expected = oracle.linear_eigen_triangulate(
                poses_np, [a[i], b[i]]
            )
            bearings = jnp.asarray(np.stack([a[i], b[i]]))[None]
            pts, ok = linear_eigen.triangulate_observations(
                Isometry3(
                    rotation=poses.rotation, translation=poses.translation
                ),
                bearings,
            )
            pt = np.asarray(pts[0])
            assert bool(np.asarray(ok[0])) == (expected is not None), i
            if expected is None:
                continue
            # Homogeneous points are scale/sign equivalence classes.
            pe = expected / np.linalg.norm(expected)
            po = pt / np.linalg.norm(pt)
            if np.dot(pe, po) < 0:
                po = -po
            assert np.max(np.abs(pe - po)) < 1e-4, (i, pe, po)


@pytest.mark.slow
class TestKittiPoseOracle:
    """The full KITTI golden chain: 11 Lowes matches -> calibrated
    bearings -> eight-point -> pose candidates, cv_tpu vs oracle at 1e-4
    on the VALUES (reference akaze/tests/estimate_pose.rs flow)."""

    INTR = (9.842439e2, 9.808141e2, 6.9e2, 2.331966e2)

    def test_kitti_pose_values(self, kitti_features):
        import jax.numpy as jnp

        from cv_tpu.camera import CameraIntrinsics
        from cv_tpu.matching import match_descriptors
        from cv_tpu.solvers import eight_point

        kp0, w0, kp14, w14 = kitti_features
        ia, ib = match_descriptors(jnp.asarray(w0), jnp.asarray(w14))
        assert len(ia) == 11
        fx, fy, cx, cy = self.INTR
        intr = CameraIntrinsics.from_values(fx, fy, cx, cy)
        a = np.asarray(
            intr.calibrate(jnp.asarray(kp0["point"][ia], jnp.float64))
        )
        b = np.asarray(
            intr.calibrate(jnp.asarray(kp14["point"][ib], jnp.float64))
        )
        a8, b8 = a[:8], b[:8]
        e_oracle = oracle.eight_point_essential(a8, b8)
        oracle_poses = oracle.possible_unscaled_poses(e_oracle)
        ours = eight_point.estimate(jnp.asarray(a8), jnp.asarray(b8))
        ours_r = np.asarray(ours.rotation)
        ours_t = np.asarray(ours.translation)
        for i in range(4):
            assert any(
                _pose_close(ours_r[i], ours_t[i], r, t)
                for r, t in oracle_poses
            ), i
        # Motion sanity on the candidate set: KITTI frames 0->14 drive
        # forward, so among the four candidates there must be one with a
        # small rotation, near-pure-z translation, and strong cheirality
        # support (points triangulating in front of both cameras).  The
        # 8-match estimate at the reference's loose 0.1 threshold is noisy
        # enough that the twisted pair can edge the cheirality vote by one
        # on these 11 matches, so this is an existence check, not an
        # argmax — the engine's consensus (scored over all hypotheses)
        # does the real disambiguation.
        def n_cheiral(rot, t):
            poses = [(np.eye(3), np.zeros(3)), (rot, t)]
            return sum(
                oracle.linear_eigen_triangulate(poses, [a[i], b[i]])
                is not None
                for i in range(len(a))
            )

        def angle_deg(rot):
            return np.degrees(
                np.arccos(np.clip((np.trace(rot) - 1) / 2, -1, 1))
            )

        assert any(
            angle_deg(rot) < 5.0
            and abs(t[2]) / np.linalg.norm(t) > 0.9
            and n_cheiral(rot, t) >= 9
            for rot, t in oracle_poses
        ), [(angle_deg(r), t / np.linalg.norm(t), n_cheiral(r, t))
            for r, t in oracle_poses]
