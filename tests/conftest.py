"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The driver benches on real TPU; tests validate numerics (f64) and multi-chip
sharding on host CPU devices, per the build environment contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config entry is
# authoritative (verified: env var alone still selects the TPU).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the KITTI-shape extractor programs take minutes
# to build on CPU; cache them across test processes.  Concurrent suite runs
# may share the dir safely — JAX's persistent cache writes entries via
# temp-file + atomic rename — but CV_TPU_TEST_CACHE_DIR overrides it for
# full isolation when wanted.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("CV_TPU_TEST_CACHE_DIR", "/tmp/cv_tpu_jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np
import pytest

from cv_tpu.utils.fixtures import fixture_path


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tier (SfM engine fixtures, KITTI golden extracts, "
        "statistical solver tests). Fast tier: pytest -m 'not slow' (~7 min "
        "cold, less with a warm compile cache).",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def kitti_features():
    """AKAZE sparse features of the two KITTI fixtures (golden: 399/343)."""
    from cv_tpu.akaze import Akaze, AkazeExtractor, load_gray

    ex = AkazeExtractor(Akaze.sparse())
    kp0, w0 = ex.extract(load_gray(fixture_path("0000000000.png")))
    kp14, w14 = ex.extract(load_gray(fixture_path("0000000014.png")))
    return kp0, w0, kp14, w14
