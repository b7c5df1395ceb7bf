"""Batched Nister-Stewenius five-point relative pose.

Re-design of ``/root/reference/nister-stewenius/src/lib.rs``.  The polynomial
ring machinery (20-monomial basis, o1/o2 products, the 10x20 constraint
matrix from Nister's equations 19-23) vectorizes directly.  The step with no
TPU-native primitive is the reference's dense nonsymmetric 10x10
eigendecomposition (lib.rs:267-278): XLA has no nonsymmetric eig on TPU, so
the action matrix is balanced (Osborne), its characteristic polynomial taken
(Faddeev-LeVerrier), all 10 roots found simultaneously with Durand-Kerner in
complex arithmetic, and eigenvectors recovered by inverse iteration.  This keeps the whole solver jittable and batched (a RANSAC call
solves all hypotheses at once, 40 candidate poses each).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from ..core import smallmat

from ..camera import essential as essential_mod
from ..core.pose import CameraToCamera

MIN_SAMPLES = 5
MAX_ESSENTIALS = 10
MODELS_PER_SAMPLE = 40

EIGEN_THRESHOLD = 1e-12
DK_ITERS = 80
INV_ITERS = 3

# Monomial basis indices (lib.rs:15-34).
XXX, XXY, XYY, YYY, XXZ, XYZ, YYZ, XZZ, YZZ, ZZZ = range(10)
XX, XY, YY, XZ, YZ, ZZ, X, Y, Z, ONE = range(10, 20)


def _o1(a, b):
    """Product of two degree-1 polynomials in (x, y, z, w) (lib.rs:98-114).

    ``a``/``b``: (..., 4) -> (..., 20).
    """
    out = jnp.zeros(a.shape[:-1] + (20,), a.dtype)
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    out = out.at[..., XX].set(ax * bx)
    out = out.at[..., XY].set(ax * by + ay * bx)
    out = out.at[..., XZ].set(ax * bz + az * bx)
    out = out.at[..., YY].set(ay * by)
    out = out.at[..., YZ].set(ay * bz + az * by)
    out = out.at[..., ZZ].set(az * bz)
    out = out.at[..., X].set(ax * bw + aw * bx)
    out = out.at[..., Y].set(ay * bw + aw * by)
    out = out.at[..., Z].set(az * bw + aw * bz)
    out = out.at[..., ONE].set(aw * bw)
    return out


def _o2(a, b):
    """Degree-2 poly (..., 20) times degree-1 (..., 4) (lib.rs:116-140)."""
    out = jnp.zeros_like(a)
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    g = lambda i: a[..., i]
    out = out.at[..., XXX].set(g(XX) * bx)
    out = out.at[..., XXY].set(g(XX) * by + g(XY) * bx)
    out = out.at[..., XXZ].set(g(XX) * bz + g(XZ) * bx)
    out = out.at[..., XYY].set(g(XY) * by + g(YY) * bx)
    out = out.at[..., XYZ].set(g(XY) * bz + g(YZ) * bx + g(XZ) * by)
    out = out.at[..., XZZ].set(g(XZ) * bz + g(ZZ) * bx)
    out = out.at[..., YYY].set(g(YY) * by)
    out = out.at[..., YYZ].set(g(YY) * bz + g(YZ) * by)
    out = out.at[..., YZZ].set(g(YZ) * bz + g(ZZ) * by)
    out = out.at[..., ZZZ].set(g(ZZ) * bz)
    out = out.at[..., XX].set(g(XX) * bw + g(X) * bx)
    out = out.at[..., XY].set(g(XY) * bw + g(X) * by + g(Y) * bx)
    out = out.at[..., XZ].set(g(XZ) * bw + g(X) * bz + g(Z) * bx)
    out = out.at[..., YY].set(g(YY) * bw + g(Y) * by)
    out = out.at[..., YZ].set(g(YZ) * bw + g(Y) * bz + g(Z) * by)
    out = out.at[..., ZZ].set(g(ZZ) * bw + g(Z) * bz)
    out = out.at[..., X].set(g(X) * bw + g(ONE) * bx)
    out = out.at[..., Y].set(g(Y) * bw + g(ONE) * by)
    out = out.at[..., Z].set(g(Z) * bw + g(ONE) * bz)
    out = out.at[..., ONE].set(g(ONE) * bw)
    return out


def nullspace_basis(a: jnp.ndarray, b: jnp.ndarray):
    """4-dim nullspace of the 5x9 epipolar constraint (lib.rs:68-96).

    ``a``/``b``: (..., 5, 3). Returns ``(basis (..., 9, 4), ok)``; ``ok``
    requires nullity exactly 4.

    In f32 this is THE precision-critical stage (measured,
    experiments/exp_r5_5pt_stages.py): the Gram squares the condition
    number, and an f32 eigenbasis loses the entire small-baseline envelope
    while every OTHER stage tolerates f32.  So for f32 inputs the Gram and
    its Jacobi eigendecomposition run in double-word arithmetic
    (:mod:`cv_tpu.ops.dw`, ~47-bit mantissa on f32 hardware) and only the
    resulting basis is rounded; f64 inputs (the host path) keep the plain
    f64 eigensolve.
    """
    rows = (a[..., :, None] * b[..., None, :]).reshape(a.shape[:-1] + (9,))
    if rows.dtype == jnp.float32:
        from ..ops import dw

        # rows entries are single products of f32 inputs — exact in dw.
        rh, rl = dw.two_prod(
            a[..., :, None].astype(jnp.float32),
            b[..., None, :].astype(jnp.float32),
        )
        rh = rh.reshape(a.shape[:-1] + (9,))
        rl = rl.reshape(a.shape[:-1] + (9,))
        prod = dw.mul(
            (rh[..., :, :, None], rl[..., :, :, None]),
            (rh[..., :, None, :], rl[..., :, None, :]),
        )  # (..., 5, 9, 9) dw
        gram = (prod[0][..., 0, :, :], prod[1][..., 0, :, :])
        for k in range(1, rows.shape[-2]):
            gram = dw.add(gram, (prod[0][..., k, :, :], prod[1][..., k, :, :]))
        vals, vecs = dw.eigh_jacobi_dw(gram[0], gram[1], sweeps=10)
        basis = vecs[..., :, :4].astype(rows.dtype)
        v3 = vals[0][..., 3] + vals[1][..., 3]
        v4 = vals[0][..., 4] + vals[1][..., 4]
        ok = (v3 <= EIGEN_THRESHOLD) & (v4 > EIGEN_THRESHOLD)
        return basis, ok
    ee = smallmat.matmul_tn(rows, rows)
    from ..ops.eigen import eigh_small

    vals, vecs = eigh_small(ee, sweeps=8)  # ascending
    basis = vecs[..., :, :4]
    ok = (vals[..., 3] <= EIGEN_THRESHOLD) & (vals[..., 4] > EIGEN_THRESHOLD)
    return basis, ok


def polynomial_constraints(basis: jnp.ndarray) -> jnp.ndarray:
    """The 10x20 constraint matrix (lib.rs:142-204). ``basis``: (..., 9, 4)."""
    ep = [[basis[..., 3 * i + j, :] for j in range(3)] for i in range(3)]

    rows = []
    det_row = (
        _o2(_o1(ep[0][1], ep[1][2]) - _o1(ep[0][2], ep[1][1]), ep[2][0])
        + _o2(_o1(ep[0][2], ep[1][0]) - _o1(ep[0][0], ep[1][2]), ep[2][1])
        + _o2(_o1(ep[0][0], ep[1][1]) - _o1(ep[0][1], ep[1][0]), ep[2][2])
    )
    rows.append(det_row)

    eet = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            if i <= j:
                eet[i][j] = (
                    _o1(ep[i][0], ep[j][0])
                    + _o1(ep[i][1], ep[j][1])
                    + _o1(ep[i][2], ep[j][2])
                )
            else:
                eet[i][j] = eet[j][i]
    trace = 0.5 * (eet[0][0] + eet[1][1] + eet[2][2])
    l = [[eet[i][j] - trace if i == j else eet[i][j] for j in range(3)] for i in range(3)]
    for i in range(3):
        for j in range(3):
            leij = (
                _o2(l[i][0], ep[0][j]) + _o2(l[i][1], ep[1][j]) + _o2(l[i][2], ep[2][j])
            )
            rows.append(leij)
    return jnp.stack(rows, axis=-2)  # (..., 10, 20)


def action_matrix(constraints: jnp.ndarray):
    """Gauss-Jordan elimination + action matrix build (lib.rs:256-280)."""
    c10 = constraints[..., :, :10]
    c_rest = constraints[..., :, 10:]
    m = jnp.linalg.solve(c10, c_rest)  # (..., 10, 10)
    ok = jnp.all(jnp.isfinite(m), axis=(-1, -2))
    m = jnp.where(ok[..., None, None], m, 0.0)
    at = jnp.zeros_like(m)
    at = at.at[..., 0:3, :].set(m[..., 0:3, :])
    at = at.at[..., 3, :].set(m[..., 4, :])
    at = at.at[..., 4, :].set(m[..., 5, :])
    at = at.at[..., 5, :].set(m[..., 7, :])
    at = at.at[..., 6, 0].set(-1.0)
    at = at.at[..., 7, 1].set(-1.0)
    at = at.at[..., 8, 3].set(-1.0)
    at = at.at[..., 9, 6].set(-1.0)
    return at, ok


def real_eigen_10(at: jnp.ndarray):
    """Real eigenvalues + eigenvectors of a 10x10 batch, TPU-native.

    Characteristic polynomial (Faddeev-LeVerrier on the balanced matrix) +
    Durand-Kerner all-roots iteration, then inverse iteration for the
    eigenvectors — replaces the reference's ``complex_eigenvalues`` +
    per-eigenvalue SVD (lib.rs:206-233) with batched TPU-friendly primitives.

    Returns ``(eigvals (..., 10), eigvecs (..., 10, 10), valid (..., 10))``.
    """
    dtype = at.dtype
    eye = jnp.eye(10, dtype=dtype)

    # Osborne balancing (power-of-two similarity scaling): does not move
    # eigenvalues but shrinks the Gershgorin radius by orders of magnitude,
    # which the det-sign grid needs to resolve the roots.  ``d`` accumulates
    # the similarity diagonal so eigenvectors can be mapped back:
    # balanced = D^-1 A D  =>  v_A = D v_balanced.
    d = jnp.ones(at.shape[:-1], dtype)
    for _ in range(4):
        for i in range(10):
            col = jnp.sum(jnp.abs(at[..., :, i]), axis=-1) - jnp.abs(at[..., i, i])
            row = jnp.sum(jnp.abs(at[..., i, :]), axis=-1) - jnp.abs(at[..., i, i])
            safe = (col > 0) & (row > 0)
            f = jnp.where(safe, jnp.sqrt(row / jnp.where(safe, col, 1.0)), 1.0)
            f = jnp.exp2(jnp.round(jnp.log2(f)))
            at = at.at[..., :, i].multiply(f[..., None])
            at = at.at[..., i, :].divide(f[..., None])
            d = d.at[..., i].multiply(f)

    # Characteristic polynomial of the balanced matrix via Faddeev-LeVerrier
    # (10 batched matmuls; exact in exact arithmetic, well-conditioned after
    # balancing), then all 10 roots at once with Durand-Kerner iteration in
    # complex f64 — the batched stand-in for nalgebra's complex_eigenvalues.
    # In f32 the recursion runs in double-word arithmetic: the coefficient
    # cancellation costs real envelope (stage bisection: f32 charpoly alone
    # drops 0.97 -> 0.70 recovery; exp_r5_5pt_stages), while the f32 ROOTS
    # stage downstream is harmless (0.98 with everything else f64).
    n = 10
    if dtype == jnp.float32:
        from ..ops import dw

        at_dw = (at, jnp.zeros_like(at))

        def dw_matmul(a, b):
            # (..., n, n) dw x dw: contraction as explicit dw ops.
            acc = dw.mul(
                (a[0][..., :, :, None], a[1][..., :, :, None]),
                (b[0][..., None, :, :], b[1][..., None, :, :]),
            )  # (..., n, n, n): [i, k, j]
            out = (acc[0][..., :, 0, :], acc[1][..., :, 0, :])
            for kk in range(1, n):
                out = dw.add(out, (acc[0][..., :, kk, :], acc[1][..., :, kk, :]))
            return out

        def dw_trace(a):
            t = (a[0][..., 0, 0], a[1][..., 0, 0])
            for ii in range(1, n):
                t = dw.add(t, (a[0][..., ii, ii], a[1][..., ii, ii]))
            return t

        ones = jnp.ones(at.shape[:-2], dtype)
        coeffs = [(ones, jnp.zeros_like(ones))]
        mk = at_dw
        eye_b = jnp.broadcast_to(eye, at.shape)
        for k in range(1, n + 1):
            tr = dw_trace(mk)
            ck = dw.div(dw.neg(tr), dw.from_f32(jnp.full_like(tr[0], float(k))))
            coeffs.append(ck)
            if k < n:
                shifted = dw.add(
                    mk,
                    dw.mul(
                        (ck[0][..., None, None], ck[1][..., None, None]),
                        (eye_b, jnp.zeros_like(eye_b)),
                    ),
                )
                mk = dw_matmul(at_dw, shifted)
        poly = jnp.stack([dw.to_f32(c) for c in coeffs], axis=-1)
    else:
        coeffs = [jnp.ones(at.shape[:-2], dtype)]  # leading 1 (monic)
        mk = at
        for k in range(1, n + 1):
            ck = -jnp.trace(mk, axis1=-2, axis2=-1) / k
            coeffs.append(ck)
            if k < n:
                mk = smallmat.matmul(at, mk + ck[..., None, None] * eye)
        poly = jnp.stack(coeffs, axis=-1)  # (..., 11), poly[0] = 1

    # Rescale lambda = s mu with s = Gershgorin radius so all roots fall in
    # ~ the unit disk — Durand-Kerner from a unit-circle start then converges
    # uniformly regardless of the raw eigenvalue magnitudes.
    #
    # Complex arithmetic is ENTIRELY unimplemented on this TPU backend
    # (probed: even eager complex64 multiply fails UNIMPLEMENTED), so the
    # iteration runs on explicit (re, im) pairs — same math, real ops only.
    s_rad = jnp.max(jnp.sum(jnp.abs(at), axis=-1), axis=-1) + 1.0
    powers = s_rad[..., None] ** jnp.arange(n + 1)
    poly_s = poly / powers
    angles = 2.0 * np.pi * np.arange(n) / n + 0.4
    zr = jnp.broadcast_to(
        jnp.asarray(np.cos(angles), dtype), poly.shape[:-1] + (n,)
    )
    zi = jnp.broadcast_to(
        jnp.asarray(np.sin(angles), dtype), poly.shape[:-1] + (n,)
    )

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    def horner(xr, xi):
        hr = jnp.broadcast_to(poly_s[..., 0:1], xr.shape)
        hi = jnp.zeros_like(hr)
        for k in range(1, n + 1):
            hr, hi = cmul(hr, hi, xr, xi)
            hr = hr + poly_s[..., k : k + 1]
        return hr, hi

    eye_n = jnp.eye(n, dtype=dtype)
    for _ in range(DK_ITERS):
        dr = zr[..., :, None] - zr[..., None, :] + eye_n  # mask self-diff
        di = zi[..., :, None] - zi[..., None, :]
        pr = dr[..., 0]
        pi = di[..., 0]
        for kk in range(1, n):
            pr, pi = cmul(pr, pi, dr[..., kk], di[..., kk])
        hr, hi = horner(zr, zi)
        # (hr + i hi) / (pr + i pi) via Smith's algorithm — the naive
        # |p|^2 denominator underflows f32 for clustered roots (measured:
        # recovery 0.83 -> 0.30 at b=0.03), which is exactly why XLA's own
        # complex division is Smith-scaled.
        big = jnp.abs(pr) >= jnp.abs(pi)
        num = jnp.where(big, pr, pi)
        alt = jnp.where(big, pi, pr)
        r = alt / num
        den = num + alt * r
        sr = jnp.where(big, (hr + hi * r) / den, (hr * r + hi) / den)
        si = jnp.where(big, (hi - hr * r) / den, (hi * r - hr) / den)
        ok_step = jnp.isfinite(sr) & jnp.isfinite(si)
        zr = zr - jnp.where(ok_step, sr, 0.0)
        zi = zi - jnp.where(ok_step, si, 0.0)
    zr = zr * s_rad[..., None]
    zi = zi * s_rad[..., None]

    # Keep every root's real part as a candidate (Durand-Kerner may leave a
    # residual imaginary part on hard clustered roots); Rayleigh-quotient
    # iteration polishes each candidate and the final eigen-residual decides
    # validity — the batched analog of the reference's SVD null-space check
    # (lib.rs:206-218).
    roots = zr  # (..., 10)

    radius = jnp.max(jnp.sum(jnp.abs(at), axis=-1), axis=-1) + 1.0  # Gershgorin
    reg = (1e-12 * radius)[..., None, None, None] * eye
    v = jnp.ones(roots.shape + (10,), dtype)
    lam = roots
    for _ in range(INV_ITERS + 2):
        m_shift = at[..., None, :, :] - lam[..., :, None, None] * eye + reg
        v_new = jnp.linalg.solve(m_shift, v[..., :, None])[..., 0]
        v_new = v_new / jnp.linalg.norm(v_new, axis=-1, keepdims=True)
        v = jnp.where(jnp.all(jnp.isfinite(v_new), axis=-1)[..., None], v_new, v)
        av = jnp.swapaxes(smallmat.matmul(at, jnp.swapaxes(v, -1, -2)), -1, -2)
        lam = jnp.sum(v * av, axis=-1)  # Rayleigh quotient update
    av = jnp.swapaxes(smallmat.matmul(at, jnp.swapaxes(v, -1, -2)), -1, -2)
    resid = jnp.linalg.norm(av - lam[..., None] * v, axis=-1)
    # The eigen-residual test alone decides: a candidate seeded from a
    # complex pair either re-converges onto a genuine real eigenvalue
    # (harmless duplicate model) or keeps a large residual and is dropped.
    valid = resid <= 1e-7 * radius[..., None]
    # Undo the balancing similarity on the eigenvectors.
    v = v * d[..., None, :]
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    finite = jnp.all(jnp.isfinite(v), axis=-1)
    return lam, v, valid & finite


def essentials_from_matches(a: jnp.ndarray, b: jnp.ndarray):
    """Up to 10 essential matrices per 5-point sample (lib.rs:241-280).

    ``a``/``b``: (..., 5, 3). Returns ``(E (..., 10, 3, 3), valid (..., 10))``.
    """
    basis, ok0 = nullspace_basis(a, b)
    constraints = polynomial_constraints(basis)
    at, ok1 = action_matrix(constraints)
    _, vecs, ok2 = real_eigen_10(at)
    # Solution coordinates (x, y, z, w) live in eigenvector components 6..9
    # of the reduced monomial basis [xx,xy,yy,xz,yz,zz,x,y,z,1] — matching
    # Stewenius' published MATLAB (V([7 8 9 10])). NOTE: the reference takes
    # rows 5..8 (lib.rs:230), which is off by one; its five-point solver has
    # no end-to-end test (nister-stewenius/tests/manual.rs is commented out)
    # and never recovers a valid essential matrix with that window. Verified
    # empirically: v[6:10] reproduces E_true to 1e-13, v[5:9] does not.
    v4 = vecs[..., 6:10]  # (..., 10, 4)
    e_flat = jnp.sum(
        basis[..., None, :, :] * v4[..., :, None, :], axis=-1
    )  # (..., 10, 9): basis (..., 9, 4) x v4 (..., 10, 4)
    # Matrix3::from_iterator is column-major: E[r, c] = flat[3c + r].
    e = jnp.swapaxes(e_flat.reshape(e_flat.shape[:-1] + (3, 3)), -1, -2)
    valid = ok0[..., None] & ok1[..., None] & ok2
    return e, valid


def estimate(a: jnp.ndarray, b: jnp.ndarray):
    """Estimator::estimate (lib.rs:305-330): (..., 5, 3) matches ->
    ``(CameraToCamera with batch (..., 40), valid (..., 40))``."""
    e, valid = essentials_from_matches(a, b)
    poses4 = essential_mod.possible_unscaled_poses(e)  # batch (..., 10, 4)
    shape = poses4.batch_shape[:-2] + (MODELS_PER_SAMPLE,)
    poses = CameraToCamera(
        rotation=poses4.rotation.reshape(shape + (3, 3)),
        translation=poses4.translation.reshape(shape + (3,)),
    )
    valid40 = jnp.repeat(valid, 4, axis=-1)
    valid40 &= jnp.all(jnp.isfinite(poses.rotation), axis=(-1, -2))
    return poses, valid40
