"""Interpret-mode correctness of the Pallas patch-sample selection kernels
(akaze/pallas_mldb.py) against a plain gather.  The bf16x3 split must be
bit-exact: a one-hot row has a single nonzero, so each pass selects one
split term exactly and the f32 sum reconstructs the sample."""

import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.akaze import pallas_mldb


@pytest.mark.parametrize(
    "fn", [pallas_mldb.select_samples, pallas_mldb.select_samples_batched]
)
def test_select_matches_gather(rng, fn):
    k, c, ns = 16, 3, 128
    patches = rng.normal(size=(k, c, 128, 128)).astype(np.float32)
    rel_x = rng.integers(0, 128, (k, ns)).astype(np.int32)
    rel_y = rng.integers(0, 128, (k, ns)).astype(np.int32)
    out = np.asarray(
        fn(jnp.asarray(patches), jnp.asarray(rel_x), jnp.asarray(rel_y), interpret=True)
    )
    ref = patches[
        np.arange(k)[:, None, None],
        np.arange(c)[None, :, None],
        rel_y[:, None, :],
        rel_x[:, None, :],
    ]
    np.testing.assert_array_equal(out, ref)
