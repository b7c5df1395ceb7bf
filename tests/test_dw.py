"""Double-word (two-float) arithmetic (cv_tpu/ops/dw.py): error-free
transforms and the dw Jacobi eigensolver that back the TPU-resident
five-point (round 5; reference nister-stewenius/src/lib.rs:68-96 does the
equivalent stage in f64 on CPU)."""

import jax.numpy as jnp
import numpy as np

from cv_tpu.ops import dw


def _pair(x64):
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _val(p):
    return np.asarray(p[0], np.float64) + np.asarray(p[1], np.float64)


def test_elementwise_ops_near_f64(rng):
    a = rng.normal(size=2000)
    b = rng.normal(size=2000)
    b[np.abs(b) < 1e-3] = 1.0  # keep divisors away from zero
    A, B = _pair(a), _pair(b)
    assert np.abs(_val(dw.add(A, B)) - (a + b)).max() < 1e-13
    assert np.abs(_val(dw.sub(A, B)) - (a - b)).max() < 1e-13
    assert np.abs(_val(dw.mul(A, B)) - (a * b)).max() < 1e-13
    rel = np.abs(_val(dw.div(A, B)) - a / b) / np.maximum(np.abs(a / b), 1e-30)
    assert rel.max() < 1e-12
    assert np.abs(
        _val(dw.sqrt(_pair(np.abs(a)))) - np.sqrt(np.abs(a))
    ).max() < 1e-13


def test_two_prod_exact(rng):
    a = rng.normal(size=1000).astype(np.float32)
    b = rng.normal(size=1000).astype(np.float32)
    p, e = dw.two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact
    )


def test_sqrt_zero_safe():
    s = dw.sqrt(dw.from_f32(jnp.zeros((3,), jnp.float32)))
    np.testing.assert_array_equal(np.asarray(s[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(s[1]), 0.0)


def test_eigh_jacobi_dw_near_singular(rng):
    """The motivating case: resolve a spectrum spanning 1e-14..2 — f32
    squashes the tail to noise; dw must recover values AND the 4-dim tail
    subspace (the five-point nullspace)."""
    q, _ = np.linalg.qr(rng.normal(size=(9, 9)))
    s = np.array([1e-14, 1e-13, 1e-12, 1e-11, 1e-8, 0.1, 0.5, 1.0, 2.0])
    a2 = (q * s) @ q.T
    a2 = (a2 + a2.T) / 2
    hi, lo = _pair(a2)
    vals, vecs = dw.eigh_jacobi_dw(hi, lo, sweeps=10)
    got = np.sort(_val(vals))
    ref = np.sort(np.linalg.eigvalsh(a2))
    np.testing.assert_allclose(got, ref, rtol=0.2, atol=5e-14)
    V = np.asarray(vecs, np.float64)
    ref_vecs = np.linalg.eigh(a2)[1][:, :4]
    svals = np.linalg.svd(V[:, :4].T @ ref_vecs)[1]
    assert svals.min() > 1 - 1e-6  # tail subspace recovered

    # Degenerate pivot guard: a matrix with exact zero off-diagonals must
    # not NaN (theta overflow poisoned the first implementation).
    d = np.diag(np.array([3.0, 1.0, 2.0, 5.0, 4.0, 6.0, 0.5, 7.0, 8.0]))
    hi, lo = _pair(d)
    vals, vecs = dw.eigh_jacobi_dw(hi, lo, sweeps=4)
    assert np.all(np.isfinite(_val(vals)))
    np.testing.assert_allclose(np.sort(_val(vals)), np.sort(np.diag(d)), atol=1e-12)
