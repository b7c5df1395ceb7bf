"""Preemptive (block) scoring of BatchConsensus (consensus/batch.py):
the prescore prefilter must keep recall on outlier-contaminated data and
must be a no-op when the model count is below prescore_keep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.consensus import BatchConsensus, Estimator
from cv_tpu.core import Isometry3, camera_to_camera_residual, lie, projective
from cv_tpu.solvers import eight_point


def _two_view_problem(seed, n=256, outlier_frac=0.4, noise=1e-3):
    rng = np.random.default_rng(seed)
    pose = Isometry3(
        rotation=lie.so3_exp(jnp.asarray([0.04, -0.08, 0.03])),
        translation=jnp.asarray([0.4, -0.1, 0.08]),
    )
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    a_h = projective.from_point(jnp.asarray(pts))
    b_h = pose.transform(a_h)
    a = np.asarray(projective.bearing(a_h))
    b = np.asarray(projective.bearing(b_h))
    b = b + rng.normal(0, noise, b.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    swap = rng.permutation(n)[:n_out]
    b[swap] = b[rng.permutation(swap)]
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
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
    return est, (jnp.asarray(a), jnp.asarray(b)), pose, n - n_out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_prescore_keeps_recall(seed):
    est, data, pose, n_in = _two_view_problem(seed)
    plain = BatchConsensus(threshold=1e-4, hypotheses=512)
    pre = BatchConsensus(
        threshold=1e-4, hypotheses=512, prescore_matches=64, prescore_keep=256
    )
    _, _, c_plain = plain.model_inliers(jax.random.key(seed), est, data)
    m_pre, _, c_pre = pre.model_inliers(jax.random.key(seed), est, data)
    # The prefilter may change which near-tied model wins but must find
    # (nearly) the same inlier mass.
    assert int(c_pre) >= int(c_plain) * 0.9, (int(c_pre), int(c_plain))
    assert int(c_pre) >= n_in * 0.7
    # And the recovered rotation must match ground truth closely.
    r_err = np.abs(np.asarray(m_pre.rotation) - np.asarray(pose.rotation)).max()
    assert r_err < 5e-2, r_err


def test_prescore_noop_when_small():
    est, data, _, _ = _two_view_problem(7)
    plain = BatchConsensus(threshold=1e-4, hypotheses=32)
    pre = BatchConsensus(
        threshold=1e-4, hypotheses=32, prescore_matches=64, prescore_keep=256
    )
    m0, k0, c0 = plain.model_inliers(jax.random.key(0), est, data)
    m1, k1, c1 = pre.model_inliers(jax.random.key(0), est, data)
    # 32 x 4 = 128 models <= prescore_keep: the prefilter must not engage.
    assert int(c0) == int(c1)
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(m0.rotation), np.asarray(m1.rotation))
