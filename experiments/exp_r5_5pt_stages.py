"""Round-5: WHERE does f32 lose the five-point small-baseline envelope?

Runs the Nister-Stewenius pipeline with a per-stage dtype schedule —
each stage computes in f64 or f32 and its OUTPUT is truncated to the next
stage's input dtype — and measures rotation recovery across baselines.
The stage whose f32 truncation first destroys recovery is the one that
needs double-word arithmetic on device (VERDICT round-5 item 5;
reference: nister-stewenius/src/lib.rs:206-280).

CPU-only (x64); stage semantics match the TPU code (elementwise f32 is
identical; TPU transcendental differences don't enter these stages).

Usage: python experiments/exp_r5_5pt_stages.py
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cv_tpu.core import lie, smallmat
from cv_tpu.solvers import nister_stewenius as ns


def synth(baseline, n_prob=64, seed=0):
    rng = np.random.default_rng(seed)
    rot = np.asarray(
        jax.vmap(lie.so3_exp)(jnp.asarray(rng.normal(size=(n_prob, 3)) * 0.1))
    )
    t = rng.normal(size=(n_prob, 3))
    t = baseline * t / np.linalg.norm(t, axis=-1, keepdims=True)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n_prob, 5, 3))
    a = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    pb = np.einsum("nij,nkj->nki", rot, pts) + t[:, None]
    b = pb / np.linalg.norm(pb, axis=-1, keepdims=True)
    return a, b, rot, t


def staged_pipeline(a, b, sched):
    """sched: dict stage->dtype with stages
    null, constr, solve, charpoly, roots, invit."""

    def c(x, stage):
        return x.astype(sched[stage])

    basis, ok0 = ns.nullspace_basis(c(jnp.asarray(a), "null"), c(jnp.asarray(b), "null"))
    constraints = ns.polynomial_constraints(c(basis, "constr"))
    at, ok1 = ns.action_matrix(c(constraints, "solve"))

    # real_eigen_10 interior, split into charpoly / roots / invit stages.
    at0 = c(at, "charpoly")
    dtype = at0.dtype
    eye = jnp.eye(10, dtype=dtype)
    d = jnp.ones(at0.shape[:-1], dtype)
    att = at0
    for _ in range(4):
        for i in range(10):
            col = jnp.sum(jnp.abs(att[..., :, i]), axis=-1) - jnp.abs(att[..., i, i])
            row = jnp.sum(jnp.abs(att[..., i, :]), axis=-1) - jnp.abs(att[..., i, i])
            safe = (col > 0) & (row > 0)
            f = jnp.where(safe, jnp.sqrt(row / jnp.where(safe, col, 1.0)), 1.0)
            f = jnp.exp2(jnp.round(jnp.log2(f)))
            att = att.at[..., :, i].multiply(f[..., None])
            att = att.at[..., i, :].divide(f[..., None])
            d = d.at[..., i].multiply(f)
    n = 10
    coeffs = [jnp.ones(att.shape[:-2], dtype)]
    mk = att
    for k in range(1, n + 1):
        ck = -jnp.trace(mk, axis1=-2, axis2=-1) / k
        coeffs.append(ck)
        if k < n:
            mk = smallmat.matmul(att, mk + ck[..., None, None] * eye)
    poly = jnp.stack(coeffs, axis=-1)

    poly = c(poly, "roots")
    rdtype = poly.dtype
    ctype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    s_rad = jnp.max(jnp.sum(jnp.abs(c(att, "roots")), axis=-1), axis=-1) + 1.0
    powers = s_rad[..., None] ** jnp.arange(n + 1)
    poly_s = poly / powers
    angles = 2.0 * jnp.pi * jnp.arange(n) / n + 0.4
    z = jnp.broadcast_to(jnp.exp(1j * angles).astype(ctype), poly.shape[:-1] + (n,))

    def horner(x):
        acc = jnp.broadcast_to(poly_s[..., 0:1].astype(ctype), x.shape)
        for k in range(1, n + 1):
            acc = acc * x + poly_s[..., k : k + 1].astype(ctype)
        return acc

    for _ in range(ns.DK_ITERS):
        diff = z[..., :, None] - z[..., None, :]
        diff = diff + jnp.eye(n, dtype=ctype)
        denom = jnp.prod(diff, axis=-1)
        step = horner(z) / denom
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        z = z - step
    z = z * s_rad[..., None].astype(ctype)
    roots = z.real

    att_i = c(att, "invit")
    idtype = att_i.dtype
    eye_i = jnp.eye(10, dtype=idtype)
    radius = jnp.max(jnp.sum(jnp.abs(att_i), axis=-1), axis=-1) + 1.0
    reg = (1e-12 * radius)[..., None, None, None] * eye_i
    v = jnp.ones(roots.shape + (10,), idtype)
    lam = c(roots, "invit")
    for _ in range(ns.INV_ITERS + 2):
        m_shift = att_i[..., None, :, :] - lam[..., :, None, None] * eye_i + reg
        v_new = jnp.linalg.solve(m_shift, v[..., :, None])[..., 0]
        v_new = v_new / jnp.linalg.norm(v_new, axis=-1, keepdims=True)
        v = jnp.where(jnp.all(jnp.isfinite(v_new), axis=-1)[..., None], v_new, v)
        av = jnp.swapaxes(smallmat.matmul(att_i, jnp.swapaxes(v, -1, -2)), -1, -2)
        lam = jnp.sum(v * av, axis=-1)
    av = jnp.swapaxes(smallmat.matmul(att_i, jnp.swapaxes(v, -1, -2)), -1, -2)
    resid = jnp.linalg.norm(av - lam[..., None] * v, axis=-1)
    valid = resid <= (1e-7 if idtype == jnp.float64 else 1e-4) * radius[..., None]
    v = v * c(d, "invit")[..., None, :]
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    finite = jnp.all(jnp.isfinite(v), axis=-1)
    valid = valid & finite

    v4 = v[..., 6:10]
    e_flat = jnp.sum(
        c(basis, "invit")[..., None, :, :] * v4[..., :, None, :], axis=-1
    )
    e = jnp.swapaxes(e_flat.reshape(e_flat.shape[:-1] + (3, 3)), -1, -2)
    return e, ok0[..., None] & ok1[..., None] & valid


def rot_recovery(a, b, rot_true, e, valid):
    """Min rotation error over candidate E decompositions, per problem."""
    from cv_tpu.camera import essential as em

    poses = em.possible_unscaled_poses(jnp.asarray(e))
    r = np.asarray(poses.rotation)  # (n, 10, 4, 3, 3)
    v = np.asarray(valid)[..., None] & np.all(
        np.isfinite(r), axis=(-1, -2)
    )
    errs = []
    for i in range(r.shape[0]):
        best = np.inf
        for j in range(r.shape[1]):
            for k2 in range(r.shape[2]):
                if not v[i, j, k2]:
                    continue
                dr = r[i, j, k2].T @ rot_true[i]
                ang = np.linalg.norm(
                    np.asarray(lie.so3_log(jnp.asarray(dr)))
                )
                best = min(best, ang)
        errs.append(best)
    return np.array(errs)


SCHEDULES = {
    "all-f64": dict.fromkeys(
        ["null", "constr", "solve", "charpoly", "roots", "invit"], jnp.float64
    ),
    "all-f32": dict.fromkeys(
        ["null", "constr", "solve", "charpoly", "roots", "invit"], jnp.float32
    ),
}
for st in ["null", "constr", "solve", "charpoly", "roots", "invit"]:
    s64 = dict(SCHEDULES["all-f64"])
    s64[st] = jnp.float32
    SCHEDULES[f"f32-{st}-only"] = s64
    s32 = dict(SCHEDULES["all-f32"])
    s32[st] = jnp.float64
    SCHEDULES[f"f64-{st}-only"] = s32


def main():
    tol = 1e-2
    print(f"{'schedule':>18s} | " + " ".join(f"b={b:g}" for b in (0.3, 0.03, 0.003)))
    for name, sched in SCHEDULES.items():
        cols = []
        for baseline in (0.3, 0.03, 0.003):
            a, b, rot, t = synth(baseline)
            e, valid = staged_pipeline(a, b, sched)
            errs = rot_recovery(a, b, rot, np.asarray(e), np.asarray(valid))
            cols.append(float(np.mean(errs < tol)))
        print(f"{name:>18s} | " + " ".join(f"{c:5.2f}" for c in cols), flush=True)


if __name__ == "__main__":
    main()
