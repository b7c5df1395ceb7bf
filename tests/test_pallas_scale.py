"""Bit-exactness of the Pallas-fused FED chain (akaze/pallas_scale.py)
against the JITTED sequential XLA path (ops.fed_step composed under jit —
the form the production scale-space program uses; an eager per-op chain
differs at ULP level because XLA contracts mul+add into FMA only under
jit).  Runs the kernel in interpret mode on CPU; the real-TPU gate is the
golden-count extractor test."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.akaze.pallas_scale import fed_chain
from cv_tpu.ops import image as ops


@partial(jax.jit, static_argnames=("taus",))
def _ref_chain(lt, flow, taus):
    for tau in taus:
        lt = ops.fed_step(lt, flow, jnp.float32(tau))
    return lt


@pytest.mark.parametrize(
    "shape,n_taus",
    [((2, 64, 96), 3), ((1, 40, 56), 10), ((3, 33, 131), 7)],
    ids=["small", "deep-chain", "odd-dims"],
)
def test_fed_chain_bit_exact(rng, shape, n_taus):
    lt = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    flow = jnp.asarray(rng.uniform(0.1, 1.0, shape).astype(np.float32))
    taus = tuple(float(t) for t in rng.uniform(0.05, 0.25, n_taus))

    ref = _ref_chain(lt, flow, taus)
    out = fed_chain(lt, flow, taus, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fed_chain_empty_taus(rng):
    lt = jnp.asarray(rng.normal(size=(1, 8, 8)).astype(np.float32))
    flow = jnp.ones_like(lt)
    out = fed_chain(lt, flow, (), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lt))


@pytest.mark.parametrize("sigma_size", [1, 2, 4])
def test_detector_response_bit_exact(rng, sigma_size):
    """Fused Lx/Ly/Ldet kernels vs the jitted ops chain."""
    from cv_tpu.akaze.pallas_scale import detector_response

    lsm = jnp.asarray(rng.normal(size=(2, 48, 72)).astype(np.float32))

    @partial(jax.jit, static_argnames=("s",))
    def ref(lsm, s):
        lx = ops.scharr_horizontal(lsm, s)
        ly = ops.scharr_vertical(lsm, s)
        lxx = ops.scharr_horizontal(lx, s)
        lyy = ops.scharr_vertical(ly, s)
        lxy = ops.scharr_vertical(lx, s)
        return lx, ly, (lxx * lyy - lxy * lxy) * jnp.float32(float(s) ** 4)

    rl = ref(lsm, sigma_size)
    out = detector_response(lsm, sigma_size, interpret=True)
    for name, a, b in zip(("lx", "ly", "ldet"), out, rl):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_extractor_pallas_deriv_parity(rng):
    """DeviceExtractor(pallas_deriv=True) must reproduce the baseline
    FeatureSet exactly (keypoints AND descriptor words)."""
    from cv_tpu.akaze import Akaze
    from cv_tpu.akaze.fast import DeviceExtractor

    img = rng.random((2, 96, 128)).astype(np.float32)
    ex_a = DeviceExtractor(Akaze(), candidate_budget=32, max_features=64)
    ex_b = DeviceExtractor(
        Akaze(), candidate_budget=32, max_features=64, pallas_deriv=True
    )
    fa = ex_a.extract(jnp.asarray(img))
    fb = ex_b.extract(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(fa.count), np.asarray(fb.count))
    np.testing.assert_array_equal(np.asarray(fa.words), np.asarray(fb.words))
    np.testing.assert_array_equal(np.asarray(fa.point), np.asarray(fb.point))
