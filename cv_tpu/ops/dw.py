"""Double-word (two-float) arithmetic: ~47-bit mantissa precision from pairs
of f32 values, entirely in f32 device ops.

TPU f64 is heavily emulated and its transcendentals are only f32-accurate
(docs/perf-notes.md round 1), so precision-critical *stages* use these
error-free transformations instead: a value is (hi, lo) with
``hi + lo == value`` exactly and ``|lo| <= ulp(hi)/2``.  The algorithms are
the classical Dekker/Knuth building blocks (the same ones underlying the QD
library and CUDA's double-single arithmetic); they require only IEEE
round-to-nearest f32 add/sub/mul, no FMA (if XLA contracts ``a*b - p`` into
an FMA the error term becomes exact, which is also correct).

The one consumer that motivated this module is the five-point solver's
nullspace stage: computing the 9x9 Gram eigenbasis in f32 squares the
condition number and destroys the small-baseline envelope (measured —
experiments/exp_r5_5pt_stages.py: f32-null-only recovery 0.00 vs 0.78+ with
an accurate basis, every other stage f32).  Reference being replaced:
``/root/reference/nister-stewenius/src/lib.rs:68-96`` (f64 on CPU).
"""

from __future__ import annotations

import jax.numpy as jnp

_SPLIT = jnp.float32(4097.0)  # 2**12 + 1 for f32 Dekker splitting


def two_sum(a, b):
    """Exact sum: returns (s, err) with s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fast_two_sum(a, b):
    """Exact sum assuming |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Exact product: returns (p, err) with p + err == a * b exactly."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# -- double-word ops: values are (hi, lo) pairs of same-shape f32 arrays ----


def from_f32(x):
    return x, jnp.zeros_like(x)


def to_f32(x):
    return x[0] + x[1]


def add(x, y):
    sh, eh = two_sum(x[0], y[0])
    eh = eh + (x[1] + y[1])
    return fast_two_sum(sh, eh)


def sub(x, y):
    return add(x, neg(y))


def neg(x):
    return -x[0], -x[1]


def mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return fast_two_sum(p, e)


def div(x, y):
    q1 = x[0] / y[0]
    r = sub(x, mul(from_f32(q1), y))
    q2 = (r[0] + r[1]) / y[0]
    return fast_two_sum(q1, q2)


def sqrt(x):
    """dw sqrt (one Newton correction from the f32 seed); x must be >= 0.
    Zero-safe: sqrt((0, 0)) == (0, 0)."""
    s = jnp.sqrt(x[0])
    safe = s > 0
    s_div = jnp.where(safe, s, 1.0)
    r = sub(x, mul((s, jnp.zeros_like(s)), (s, jnp.zeros_like(s))))
    e = jnp.where(safe, (r[0] + r[1]) / (2.0 * s_div), 0.0)
    return fast_two_sum(s, e)


def abs_(x):
    flip = x[0] < 0
    return jnp.where(flip, -x[0], x[0]), jnp.where(flip, -x[1], x[1])


def where(c, x, y):
    return jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1])


def scale(x, f):
    """dw times exact f32 scalar-array (no error when f is a power of two;
    general f handled via two_prod)."""
    p, e = two_prod(x[0], f)
    e = e + x[1] * f
    return fast_two_sum(p, e)


def eigh_jacobi_dw(a_hi, a_lo, sweeps: int = 10):
    """Symmetric eigendecomposition of (..., N, N) matrices in double-word
    arithmetic (cyclic Jacobi with rational rotations — no transcendentals).

    Input matrix as (hi, lo) pair; returns ``(vals (hi, lo) ascending,
    vecs f32 (..., N, N) columns)``.  The eigenVECTOR matrix accumulates in
    dw and is rounded at the end; eigenvalues keep their dw pair so callers
    can threshold below f32 noise.
    """
    n = a_hi.shape[-1]
    pairs = tuple((p, q) for p in range(n) for q in range(p + 1, n))
    zero = jnp.zeros_like(a_hi)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a_hi.dtype), a_hi.shape)
    a = (a_hi, a_lo)
    v = (jnp.array(eye), jnp.array(zero))

    def idx(x, *i):
        return (x[0][(..., *i)], x[1][(..., *i)])

    def setcol(x, i, val):
        return (
            x[0].at[..., :, i].set(val[0]),
            x[1].at[..., :, i].set(val[1]),
        )

    def setrow(x, i, val):
        return (
            x[0].at[..., i, :].set(val[0]),
            x[1].at[..., i, :].set(val[1]),
        )

    def rotate(a, v, p, q):
        app = idx(a, p, p)
        aqq = idx(a, q, q)
        apq = idx(a, p, q)
        # Rational Jacobi rotation (Golub & Van Loan 8.4): annihilate apq.
        diff = sub(aqq, app)
        # Skip negligible rotations: |apq| below the dw noise floor of the
        # diagonal contributes nothing to convergence, and letting it
        # through makes theta = diff/(2 apq) overflow f32 (inf * 0 NaN
        # poison downstream).  The guard also bounds theta^2 < ~2.5e29.
        apq_z = jnp.abs(apq[0]) <= (
            jnp.float32(1e-38)
            + jnp.float32(1e-15) * (jnp.abs(app[0]) + jnp.abs(aqq[0]))
        )
        denom = where(apq_z, from_f32(jnp.ones_like(apq[0])), scale(apq, jnp.float32(2.0)))
        theta = div(diff, denom)
        at = abs_(theta)
        root = sqrt(add(mul(at, at), from_f32(jnp.ones_like(at[0]))))
        t = div(from_f32(jnp.ones_like(at[0])), add(at, root))
        t = where(theta[0] < 0, neg(t), t)
        t = where(apq_z, from_f32(jnp.zeros_like(t[0])), t)
        c = div(
            from_f32(jnp.ones_like(t[0])),
            sqrt(add(mul(t, t), from_f32(jnp.ones_like(t[0])))),
        )
        s = mul(t, c)
        cb = (c[0][..., None], c[1][..., None])
        sb = (s[0][..., None], s[1][..., None])

        def rot_pair(xp, xq):
            new_p = sub(mul(cb, xp), mul(sb, xq))
            new_q = add(mul(sb, xp), mul(cb, xq))
            return new_p, new_q

        col_p = idx(a, slice(None), p)
        col_q = idx(a, slice(None), q)
        np_, nq_ = rot_pair(col_p, col_q)
        a = setcol(a, p, np_)
        a = setcol(a, q, nq_)
        row_p = idx(a, p, slice(None))
        row_q = idx(a, q, slice(None))
        np_, nq_ = rot_pair(row_p, row_q)
        a = setrow(a, p, np_)
        a = setrow(a, q, nq_)
        vp = idx(v, slice(None), p)
        vq = idx(v, slice(None), q)
        np_, nq_ = rot_pair(vp, vq)
        v = setcol(v, p, np_)
        v = setcol(v, q, nq_)
        return a, v

    # One sweep as the fori_loop body (36 unrolled rotations at N=9):
    # fully unrolling all sweeps explodes compile time (round-2 learning).
    import jax

    def sweep(_, av):
        a, v = av
        for p, q in pairs:
            a, v = rotate(a, v, p, q)
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps, sweep, (a, v))

    diag_hi = jnp.diagonal(a[0], axis1=-2, axis2=-1)
    diag_lo = jnp.diagonal(a[1], axis1=-2, axis2=-1)
    order = jnp.argsort(diag_hi + diag_lo, axis=-1)
    vals = (
        jnp.take_along_axis(diag_hi, order, axis=-1),
        jnp.take_along_axis(diag_lo, order, axis=-1),
    )
    vecs = jnp.take_along_axis(to_f32(v), order[..., None, :], axis=-1)
    return vals, vecs
