"""Multi-chip scaling surface (cv_tpu.parallel) on the virtual 8-device
CPU mesh: sharded runs must agree with single-device runs exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.consensus import BatchConsensus, Estimator
from cv_tpu.core import Isometry3, camera_to_camera_residual, lie, projective
from cv_tpu.parallel import make_mesh, sharded_consensus, sharded_extract
from cv_tpu.solvers import eight_point


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    return make_mesh(8)


class TestShardedExtract:
    def test_matches_single_device(self, rng, mesh):
        from cv_tpu.akaze import Akaze
        from cv_tpu.akaze.fast import DeviceExtractor

        ex = DeviceExtractor(
            Akaze(detector_threshold=0.0001), candidate_budget=32, max_features=64
        )
        images = jnp.asarray(rng.random((8, 96, 128)), jnp.float32)
        ref = ex.extract(images)
        out = sharded_extract(ex, images, mesh)
        np.testing.assert_array_equal(np.asarray(out.count), np.asarray(ref.count))
        np.testing.assert_array_equal(np.asarray(out.words), np.asarray(ref.words))
        np.testing.assert_array_equal(np.asarray(out.point), np.asarray(ref.point))
        # The output genuinely lives sharded over the mesh.
        assert len(out.words.sharding.device_set) == 8


class TestShardedConsensus:
    def test_matches_unsharded(self, rng, mesh):
        pose = Isometry3(
            rotation=lie.so3_exp(jnp.asarray([0.05, -0.1, 0.04])),
            translation=jnp.asarray([0.3, -0.1, 0.05]),
        )
        pts = rng.uniform([-2, -2, 4], [2, 2, 10], (64, 3)).astype(np.float32)
        a_h = projective.from_point(jnp.asarray(pts))
        b_h = pose.transform(a_h)
        data = (projective.bearing(a_h), projective.bearing(b_h))
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
        cons = BatchConsensus(
            threshold=1e-4, hypotheses=64, refit_rounds=1, refit_hypotheses=16
        )
        key = jax.random.key(3)
        m_ref, mask_ref, count_ref = cons.model_inliers(key, est, data)
        scons = sharded_consensus(cons, mesh)
        with mesh:
            m_sh, mask_sh, count_sh = scons.model_inliers(key, est, data)
        assert int(count_sh) == int(count_ref)
        np.testing.assert_array_equal(np.asarray(mask_sh), np.asarray(mask_ref))
        np.testing.assert_allclose(
            np.asarray(m_sh.rotation), np.asarray(m_ref.rotation), atol=1e-12
        )
