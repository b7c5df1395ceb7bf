"""Interpret-mode correctness of the Pallas patch-sample selection kernels
(akaze/pallas_mldb.py) against a plain gather.  The bf16x3 split must be
bit-exact: a one-hot row has a single nonzero, so each pass selects one
split term exactly and the f32 sum reconstructs the sample."""

import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.akaze import pallas_mldb


@pytest.mark.parametrize(
    "fn",
    [
        pallas_mldb.select_samples,
        pallas_mldb.select_samples_batched,
        pallas_mldb.select_samples_gather,
    ],
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


@pytest.mark.parametrize("mode", ["pallas", "pgather"])
def test_orient_mldb_pallas_mode_matches_highest(rng, mode):
    """orient_mldb_onehot Pallas modes must produce identical words, ok
    masks, and angles to the XLA 'highest' path — all resolve the same
    exact patch samples; only the selection engine differs."""
    from cv_tpu.akaze import descriptors as desc

    L, hmax, wmax, k = 3, 160, 192, 16
    planes = jnp.asarray(
        rng.normal(size=(L, 3, hmax, wmax)).astype(np.float32)
    )
    lvl = jnp.asarray(rng.integers(0, L, k), jnp.int32)
    width = jnp.full((k,), wmax, jnp.int32)
    height = jnp.full((k,), hmax, jnp.int32)
    xf = jnp.asarray(rng.uniform(40, wmax - 40, k).astype(np.float32))
    yf = jnp.asarray(rng.uniform(40, hmax - 40, k).astype(np.float32))
    scale = jnp.asarray(rng.uniform(1.0, 2.5, k).astype(np.float32))

    w_ref, ok_ref, ang_ref = desc.orient_mldb_onehot(
        planes, lvl, width, height, xf, yf, scale, mode="highest"
    )
    w_pl, ok_pl, ang_pl = desc.orient_mldb_onehot(
        planes, lvl, width, height, xf, yf, scale, mode=mode
    )
    np.testing.assert_array_equal(np.asarray(ok_pl), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(ang_pl), np.asarray(ang_ref))
    np.testing.assert_array_equal(np.asarray(w_pl), np.asarray(w_ref))
