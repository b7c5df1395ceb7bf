"""Device-resident patience loops — the SfM steady-state kernel.

The reference's pose optimizers run thousands of sequential tiny gradient
steps (single_view_optimizer.rs:80-135: up to ``iterations`` steps, exit
after 50 non-improving ones).  As an XLA ``while_loop`` each step lowers to
~50 small fused kernels (scalar pose math + landmark reductions) and costs
~12-15 us on the v5e — 6 optimize calls per frame registration made the
fused register cascade (sfm/device_refine.py) the SfM engine's dominant
cost (~0.39 s/call, exp_sfm_profile round 4).

Here the WHOLE patience loop is one Pallas kernel: landmark math rides the
VPU lanes ((rows, M) tiles, batch on lanes per the round-3 layout rule),
the pose lives in scalar registers across iterations, and one kernel launch
replaces ~50 per step.  The step math replicates the XLA path operation-for-
operation (same normalization and division order), so results agree to
float rounding; tests gate interpret-mode output bitwise against
``single_view_simple_optimize_l2``.

Workload reference: ``/root/reference/cv-optimize/src/single_view_optimizer.rs:80-135``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pose import Isometry3, WorldToCamera

PATIENCE = 50  # single_view_optimizer.rs:116 (shared with optimizers.py)


# --- vec3 helpers over (1, M) lane rows --------------------------------------
# A per-landmark 3-vector is a tuple of three (1, M) arrays (components on
# sublanes would relayout; components as separate rows keep every op a plain
# lane-wise VPU op — the round-3 layout rule).


def _v3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _v3_cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _v3_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _v3_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _v3_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _v3_neg(a):
    return (-a[0], -a[1], -a[2])


def _v3_norm(a):
    return jnp.sqrt(_v3_dot(a, a))


def _v3_normalize(a):
    n = _v3_norm(a)
    return (a[0] / n, a[1] / n, a[2] / n)


def _v3_where(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def _v3_isnan_any(a):
    return (a[0] != a[0]) | (a[1] != a[1]) | (a[2] != a[2])


def _v3_sum(a, mask):
    """Masked lane reduction of a vec3 -> three scalars."""
    zero = jnp.zeros_like(a[0])
    return (
        jnp.sum(jnp.where(mask, a[0], zero)),
        jnp.sum(jnp.where(mask, a[1], zero)),
        jnp.sum(jnp.where(mask, a[2], zero)),
    )


def _s3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _s3_norm(a):
    return jnp.sqrt(_s3_dot(a, a))


def _rodrigues(w):
    """so3_exp on a scalar 3-tuple -> 9 scalars row-major (lie.py:65-79)."""
    w0, w1, w2 = w
    theta2 = w0 * w0 + w1 * w1 + w2 * w2
    small = theta2 <= jnp.finfo(jnp.float32).eps
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.sqrt(t2s))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    return (
        1.0 + b * (-(w1 * w1 + w2 * w2)),
        a * (-w2) + b * (w0 * w1),
        a * w1 + b * (w0 * w2),
        a * w2 + b * (w0 * w1),
        1.0 + b * (-(w0 * w0 + w2 * w2)),
        a * (-w0) + b * (w1 * w2),
        a * (-w1) + b * (w0 * w2),
        a * w0 + b * (w1 * w2),
        1.0 + b * (-(w0 * w0 + w1 * w1)),
    )


def _m3_mul(a, b):
    """Row-major 9-scalar 3x3 product."""
    return (
        a[0] * b[0] + a[1] * b[3] + a[2] * b[6],
        a[0] * b[1] + a[1] * b[4] + a[2] * b[7],
        a[0] * b[2] + a[1] * b[5] + a[2] * b[8],
        a[3] * b[0] + a[4] * b[3] + a[5] * b[6],
        a[3] * b[1] + a[4] * b[4] + a[5] * b[7],
        a[3] * b[2] + a[4] * b[5] + a[5] * b[8],
        a[6] * b[0] + a[7] * b[3] + a[8] * b[6],
        a[6] * b[1] + a[7] * b[4] + a[8] * b[7],
        a[6] * b[2] + a[7] * b[5] + a[8] * b[8],
    )


def _m3_vec(a, v):
    return (
        a[0] * v[0] + a[1] * v[1] + a[2] * v[2],
        a[3] * v[0] + a[4] * v[1] + a[5] * v[2],
        a[6] * v[0] + a[7] * v[1] + a[8] * v[2],
    )


def _apply_tangent_scalars(dt, dr, r, t):
    """(exp(dr), exp(dr) @ dt) composed with (r, t) — Isometry3.from_tangent
    + compose, all on scalars."""
    d = _rodrigues(dr)
    ddt = _m3_vec(d, dt)
    r_new = _m3_mul(d, r)
    t_new = tuple(x + y for x, y in zip(_m3_vec(d, t), ddt))
    return r_new, t_new


def _sv_l2_kernel(pose_ref, b_ref, wp_ref, valid_ref, out_ref, *, rate, iterations):
    """One resident single-view L2 patience loop.

    ``pose_ref``: (12, 1) f32 in SMEM — r00..r22 row-major then t.
    ``b_ref``: (3, M) bearings (component-major, landmarks on lanes).
    ``wp_ref``: (4, M) homogeneous world points.  ``valid_ref``: (1, M)
    f32 0/1.  ``out_ref``: (12, 1) f32 in SMEM, same layout as ``pose_ref``.
    """
    bx = b_ref[0:1, :]
    by = b_ref[1:2, :]
    bz = b_ref[2:3, :]
    wx = wp_ref[0:1, :]
    wy = wp_ref[1:2, :]
    wz = wp_ref[2:3, :]
    ww = wp_ref[3:4, :]
    vmask = valid_ref[0:1, :] > 0.0
    inv_len = 1.0 / jnp.maximum(jnp.sum(valid_ref[0:1, :]), 1.0)
    neg_w = ww < 0.0

    def body(c):
        (r00, r01, r02, r10, r11, r12, r20, r21, r22,
         t0, t1, t2, bt, br, ni, it) = c
        # pose.transform(world_points): rotate + translate*w ...
        cx = r00 * wx + r01 * wy + r02 * wz + t0 * ww
        cy = r10 * wx + r11 * wy + r12 * wz + t1 * ww
        cz = r20 * wx + r21 * wy + r22 * wz + t2 * ww
        # ... then projective.from_homogeneous (sign flip so w >= 0, scale
        # xyz to unit norm) — replicated exactly, divisions and all, so the
        # rounding matches the XLA path.
        sx = jnp.where(neg_w, -cx, cx)
        sy = jnp.where(neg_w, -cy, cy)
        sz = jnp.where(neg_w, -cz, cz)
        sw = jnp.where(neg_w, -ww, ww)
        n = jnp.sqrt(sx * sx + sy * sy + sz * sz)
        hx = sx / n
        hy = sy / n
        hz = sz / n
        hw = sw / n
        # projective.point: euclidean camera point.
        ptx = hx / hw
        pty = hy / hw
        ptz = hz / hw
        finite = (
            (hw != 0.0)
            & (jnp.abs(ptx) < jnp.inf) & (ptx == ptx)
            & (jnp.abs(pty) < jnp.inf) & (pty == pty)
            & (jnp.abs(ptz) < jnp.inf) & (ptz == ptz)
        )
        contrib = vmask & finite
        # world_pose_gradient (epipolar.rs:188-193).
        dot = ptx * bx + pty * by + ptz * bz
        tgx = dot * bx - ptx
        tgy = dot * by - pty
        tgz = dot * bz - ptz
        pn = jnp.sqrt(ptx * ptx + pty * pty + ptz * ptz)
        ux = ptx / pn
        uy = pty / pn
        uz = ptz / pn
        rgx = uy * bz - uz * by
        rgy = uz * bx - ux * bz
        rgz = ux * by - uy * bx
        # tangent_new NaN guards (whole-vector) + the contrib mask.
        t_ok = contrib & ~((tgx != tgx) | (tgy != tgy) | (tgz != tgz))
        r_ok = contrib & ~((rgx != rgx) | (rgy != rgy) | (rgz != rgz))
        zero = jnp.zeros_like(tgx)
        l2t_x = jnp.sum(jnp.where(t_ok, tgx, zero))
        l2t_y = jnp.sum(jnp.where(t_ok, tgy, zero))
        l2t_z = jnp.sum(jnp.where(t_ok, tgz, zero))
        l2r_x = jnp.sum(jnp.where(r_ok, rgx, zero))
        l2r_y = jnp.sum(jnp.where(r_ok, rgy, zero))
        l2r_z = jnp.sum(jnp.where(r_ok, rgz, zero))

        dt0 = l2t_x * inv_len * rate
        dt1 = l2t_y * inv_len * rate
        dt2 = l2t_z * inv_len * rate
        dr0 = l2r_x * inv_len * rate
        dr1 = l2r_y * inv_len * rate
        dr2 = l2r_z * inv_len * rate

        nt = jnp.sqrt(l2t_x * l2t_x + l2t_y * l2t_y + l2t_z * l2t_z)
        nr = jnp.sqrt(l2r_x * l2r_x + l2r_y * l2r_y + l2r_z * l2r_z)
        improved = (bt > nt) | (br > nr)
        ni2 = jnp.where(improved, 0, ni + 1)
        bt2 = jnp.minimum(bt, nt)
        br2 = jnp.minimum(br, nr)

        # so3_exp (Rodrigues with the Taylor small-angle branch, lie.py).
        theta2 = dr0 * dr0 + dr1 * dr1 + dr2 * dr2
        small = theta2 <= jnp.finfo(jnp.float32).eps
        t2s = jnp.where(small, 1.0, theta2)
        theta = jnp.sqrt(theta2)
        a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.sqrt(t2s))
        b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
        # Dr = I + a*hat(w) + b*hat(w)^2 for w = (dr0, dr1, dr2).
        d00 = 1.0 + b * (-(dr1 * dr1 + dr2 * dr2))
        d01 = a * (-dr2) + b * (dr0 * dr1)
        d02 = a * dr1 + b * (dr0 * dr2)
        d10 = a * dr2 + b * (dr0 * dr1)
        d11 = 1.0 + b * (-(dr0 * dr0 + dr2 * dr2))
        d12 = a * (-dr0) + b * (dr1 * dr2)
        d20 = a * (-dr1) + b * (dr0 * dr2)
        d21 = a * dr0 + b * (dr1 * dr2)
        d22 = 1.0 + b * (-(dr0 * dr0 + dr1 * dr1))
        # from_tangent translation: Dr @ dt.
        ddt0 = d00 * dt0 + d01 * dt1 + d02 * dt2
        ddt1 = d10 * dt0 + d11 * dt1 + d12 * dt2
        ddt2 = d20 * dt0 + d21 * dt1 + d22 * dt2
        # compose: R' = Dr @ R, t' = Dr @ t + Dr @ dt.
        n00 = d00 * r00 + d01 * r10 + d02 * r20
        n01 = d00 * r01 + d01 * r11 + d02 * r21
        n02 = d00 * r02 + d01 * r12 + d02 * r22
        n10 = d10 * r00 + d11 * r10 + d12 * r20
        n11 = d10 * r01 + d11 * r11 + d12 * r21
        n12 = d10 * r02 + d11 * r12 + d12 * r22
        n20 = d20 * r00 + d21 * r10 + d22 * r20
        n21 = d20 * r01 + d21 * r11 + d22 * r21
        n22 = d20 * r02 + d21 * r12 + d22 * r22
        nt0 = d00 * t0 + d01 * t1 + d02 * t2 + ddt0
        nt1 = d10 * t0 + d11 * t1 + d12 * t2 + ddt1
        nt2 = d20 * t0 + d21 * t1 + d22 * t2 + ddt2
        keep = ni2 >= PATIENCE

        def sel(old, new):
            return jnp.where(keep, old, new)

        return (
            sel(r00, n00), sel(r01, n01), sel(r02, n02),
            sel(r10, n10), sel(r11, n11), sel(r12, n12),
            sel(r20, n20), sel(r21, n21), sel(r22, n22),
            sel(t0, nt0), sel(t1, nt1), sel(t2, nt2),
            bt2, br2, ni2, it + 1,
        )

    def cond(c):
        ni, it = c[-2], c[-1]
        return (it < iterations) & (ni < PATIENCE)

    inf = jnp.float32(jnp.inf)
    init = tuple(pose_ref[i, 0] for i in range(12)) + (
        inf, inf, jnp.int32(0), jnp.int32(0),
    )
    final = jax.lax.while_loop(cond, body, init)
    # Scalars cannot store to VMEM; the (12, 1) output block lives in SMEM.
    for i in range(12):
        out_ref[i, 0] = final[i]


@partial(jax.jit, static_argnames=("rate", "iterations", "interpret"))
def single_view_l2_resident(
    pose: Isometry3,
    bearings: jnp.ndarray,  # (N, 3)
    world_points: jnp.ndarray,  # (N, 4)
    valid: jnp.ndarray,  # (N,)
    rate: float,
    iterations: int,
    interpret: bool = False,
) -> Isometry3:
    """Drop-in for :func:`single_view_simple_optimize_l2` on TPU.

    Pads the landmark axis to a lane multiple (padded rows are invalid and
    contribute nothing) and runs the whole patience loop in one kernel.
    """
    n = bearings.shape[0]
    mp = max(128, -(-n // 128) * 128)
    pad = mp - n
    if pad:
        bearings = jnp.pad(bearings, ((0, pad), (0, 0)))
        world_points = jnp.pad(world_points, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    b_t = bearings.astype(jnp.float32).T  # (3, M)
    wp_t = world_points.astype(jnp.float32).T  # (4, M)
    vf = valid.astype(jnp.float32)[None, :]  # (1, M)
    pose_in = jnp.concatenate(
        [
            pose.rotation.astype(jnp.float32).reshape(9),
            pose.translation.astype(jnp.float32).reshape(3),
        ]
    )[:, None]
    out = pl.pallas_call(
        partial(_sv_l2_kernel, rate=float(rate), iterations=int(iterations)),
        out_shape=jax.ShapeDtypeStruct((12, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(pose_in, b_t, wp_t, vf)
    flat = out[:, 0]
    kind = type(pose) if isinstance(pose, Isometry3) else WorldToCamera
    return kind(
        rotation=flat[0:9].reshape(3, 3).astype(pose.dtype),
        translation=flat[9:12].astype(pose.dtype),
    )


# --- three-view adaptive L2 (three_view_optimizer.rs:203-272) -----------------


def _tv_triangulate_sine_l1(t, a, b):
    """two_view_same_space_triangulate_sine_l1 on vec3 lane rows
    (epipolar.rs:9-53; epipolar.py:37-66).  Returns (point vec3, ok)."""
    cross_a = _v3_cross(a, t)
    ca_n = _v3_norm(cross_a)
    na = _v3_scale(cross_a, 1.0 / ca_n)
    cross_b = _v3_cross(b, t)
    cb_n = _v3_norm(cross_b)
    nb = _v3_scale(cross_b, 1.0 / cb_n)
    use_a = ca_n < cb_n
    new_a = _v3_normalize(_v3_sub(a, _v3_scale(nb, _v3_dot(a, nb))))
    new_b = _v3_normalize(_v3_sub(b, _v3_scale(na, _v3_dot(b, na))))
    a_c = _v3_where(use_a, new_a, a)
    b_c = _v3_where(use_a, b, new_b)
    z = _v3_cross(a_c, b_c)
    w = _v3_dot(z, z) / _v3_dot(z, _v3_cross(t, b_c))
    # Projective normalization with the sign flip for w >= 0.
    flip = w < 0.0
    hx = _v3_where(flip, _v3_neg(a_c), a_c)
    hw = jnp.where(flip, -w, w)
    bearing = _v3_normalize(hx)
    finite = (
        ~_v3_isnan_any(hx)
        & (jnp.abs(hx[0]) < jnp.inf)
        & (jnp.abs(hx[1]) < jnp.inf)
        & (jnp.abs(hx[2]) < jnp.inf)
        & (hw == hw)
        & (jnp.abs(hw) < jnp.inf)
    )
    cheir = (_v3_dot(bearing, a_c) >= 0.0) & (_v3_dot(bearing, b_c) >= 0.0)
    w_safe = jnp.where(hw == 0.0, jnp.float32(jnp.inf), hw)
    point = _v3_scale(bearing, 1.0 / w_safe)
    pt_finite = (
        ~_v3_isnan_any(point)
        & (jnp.abs(point[0]) < jnp.inf)
        & (jnp.abs(point[1]) < jnp.inf)
        & (jnp.abs(point[2]) < jnp.inf)
    )
    ok = finite & cheir & pt_finite
    zero = jnp.zeros_like(point[0])
    return _v3_where(ok, point, (zero, zero, zero)), ok


def _tv_rotation_gradient(t, a, b):
    """two_view_rotation_gradient (epipolar.rs:56-71)."""
    cross_a = _v3_cross(a, t)
    cross_b = _v3_cross(b, t)
    return _v3_cross(_v3_normalize(cross_b), _v3_normalize(cross_a))


def _tv_tangent_rows(rf, tf, rs, ts, c, fo, so):
    """Per-landmark three-view tangent rows for both poses
    (epipolar.rs:85-166 via optimizers._three_view_landmark_gradients).

    ``rf``/``tf``/``rs``/``ts``: scalar pose pieces (camera-to-center);
    ``c``/``fo``/``so``: (1, M) bearing row-triples.  Returns
    ``(first_trans, first_rot, second_trans, second_rot)`` row-triples with
    the reference's 2/3-1/3 edge weighting (NaN guards are the callers'
    masked sums)."""
    third = jnp.float32(1.0 / 3.0)
    two_third = jnp.float32(2.0 / 3.0)
    # f = ftoc.rotate(obs_first), s = stoc.rotate(obs_second): rotation
    # only, scalar x vec3 rows.
    f = (
        rf[0] * fo[0] + rf[1] * fo[1] + rf[2] * fo[2],
        rf[3] * fo[0] + rf[4] * fo[1] + rf[5] * fo[2],
        rf[6] * fo[0] + rf[7] * fo[1] + rf[8] * fo[2],
    )
    s = (
        rs[0] * so[0] + rs[1] * so[1] + rs[2] * so[2],
        rs[3] * so[0] + rs[4] * so[1] + rs[5] * so[2],
        rs[6] * so[0] + rs[7] * so[1] + rs[8] * so[2],
    )
    # Scalar 3-tuples broadcast against the (1, M) rows in every vec3 op.
    ftoc_t = tf
    stoc_t = ts
    stof = _v3_sub(stoc_t, ftoc_t)

    rot_cf = _tv_rotation_gradient(ftoc_t, c, f)
    rot_cs = _tv_rotation_gradient(stoc_t, c, s)
    rot_fs = _tv_rotation_gradient(stof, f, s)
    first_rot = _v3_add(
        _v3_scale(rot_cf, two_third), _v3_scale(_v3_neg(rot_fs), third)
    )
    second_rot = _v3_add(
        _v3_scale(rot_cs, two_third), _v3_scale(rot_fs, third)
    )

    p_f, ok_f = _tv_triangulate_sine_l1(_v3_neg(stoc_t), c, s)
    pf = _v3_sub(p_f, ftoc_t)
    trans_f = _v3_sub(pf, _v3_scale(f, _v3_dot(pf, f)))
    zero3 = (
        jnp.zeros_like(f[0]), jnp.zeros_like(f[0]), jnp.zeros_like(f[0])
    )
    trans_f = _v3_where(ok_f, trans_f, zero3)

    p_s, ok_s = _tv_triangulate_sine_l1(_v3_neg(ftoc_t), c, f)
    ps = _v3_sub(p_s, stoc_t)
    trans_s = _v3_sub(ps, _v3_scale(s, _v3_dot(ps, s)))
    trans_s = _v3_where(ok_s, trans_s, zero3)

    p_c, ok_c = _tv_triangulate_sine_l1(_v3_neg(stof), f, s)
    pc = _v3_add(p_c, ftoc_t)
    trans_c = _v3_sub(_v3_scale(c, _v3_dot(pc, c)), pc)
    trans_c = _v3_where(ok_c, trans_c, zero3)

    first_trans = _v3_add(
        _v3_scale(trans_f, two_third), _v3_scale(trans_c, third)
    )
    second_trans = _v3_add(
        _v3_scale(trans_s, two_third), _v3_scale(trans_c, third)
    )
    return first_trans, first_rot, second_trans, second_rot


def _tv_kernel(poses_ref, obs_ref, valid_ref, out_ref, *, iterations):
    """One problem's whole adaptive three-view loop.

    ``poses_ref``: (K, 24) f32 SMEM (whole array; the kernel reads row
    ``program_id(0)``) — ftoc r00..r22,t0..t2 then stoc.  ``obs_ref``:
    (1, 9, M) f32 block — row view*3+component, landmarks on lanes (views:
    center, first, second).  ``valid_ref``: (1, 1, M) f32 0/1.
    ``out_ref``: (K, 24) f32 SMEM (whole array; writes row program_id)."""
    pid = pl.program_id(0)
    c = (obs_ref[0, 0:1, :], obs_ref[0, 1:2, :], obs_ref[0, 2:3, :])
    fo = (obs_ref[0, 3:4, :], obs_ref[0, 4:5, :], obs_ref[0, 5:6, :])
    so = (obs_ref[0, 6:7, :], obs_ref[0, 7:8, :], obs_ref[0, 8:9, :])
    vrow = valid_ref[0, 0:1, :]
    vmask = vrow > 0.0
    inv_len = 1.0 / jnp.maximum(jnp.sum(vrow), 1.0)

    def one_pose_delta(t_g, r_g):
        """Adaptive delta from per-landmark tangents (masked)."""
        t_bad = _v3_isnan_any(t_g)
        r_bad = _v3_isnan_any(r_g)
        t_ok = vmask & ~t_bad
        r_ok = vmask & ~r_bad
        mean_t = tuple(x * inv_len for x in _v3_sum(t_g, t_ok))
        mean_r = tuple(x * inv_len for x in _v3_sum(r_g, r_ok))
        zero = jnp.zeros_like(t_g[0])
        tstd = jnp.sum(jnp.where(t_ok, _v3_norm(t_g), zero)) * inv_len
        rstd = jnp.sum(jnp.where(r_ok, _v3_norm(r_g), zero)) * inv_len
        trate = _s3_norm(mean_t) / tstd
        rrate = _s3_norm(mean_r) / rstd
        trate = jnp.where(
            (trate == trate) & (jnp.abs(trate) < jnp.inf), trate, 0.0
        )
        rrate = jnp.where(
            (rrate == rrate) & (jnp.abs(rrate) < jnp.inf), rrate, 0.0
        )
        dt = tuple(x * trate for x in mean_t)
        dr = tuple(x * rrate for x in mean_r)
        return dt, dr

    def body(_, carry):
        rf, tf = carry[0:9], carry[9:12]
        rs, ts = carry[12:21], carry[21:24]
        first_trans, first_rot, second_trans, second_rot = _tv_tangent_rows(
            rf, tf, rs, ts, c, fo, so
        )
        dt1, dr1 = one_pose_delta(first_trans, first_rot)
        dt2, dr2 = one_pose_delta(second_trans, second_rot)
        rf2, tf2 = _apply_tangent_scalars(dt1, dr1, rf, tf)
        rs2, ts2 = _apply_tangent_scalars(dt2, dr2, rs, ts)
        return rf2 + tf2 + rs2 + ts2

    init = tuple(poses_ref[pid, i] for i in range(24))
    final = jax.lax.fori_loop(0, iterations, body, init)
    for i in range(24):
        out_ref[pid, i] = final[i]


@partial(jax.jit, static_argnames=("iterations", "interpret"))
def three_view_adaptive_resident(
    rot1, t1, rot2, t2, obs, valid, iterations: int, interpret: bool = False
):
    """Batched drop-in for the vmapped :func:`three_view_adaptive_optimize_l2`
    (the engine's ``_three_view_batch_device``): a Pallas grid over the K
    problems, each running its whole fixed-iteration loop in one kernel.

    ``rot1``/``t1``/``rot2``/``t2``: (K, 3, 3)/(K, 3) camera-to-center
    poses ALREADY inverted (this kernel implements the inner loop; the
    caller handles the inverse/inverse-back convention).  ``obs``:
    (K, N, 3, 3) bearings (center, first, second); ``valid``: (K, N).
    Returns the same pose tuple layout.
    """
    k, n = obs.shape[0], obs.shape[1]
    mp = max(128, -(-n // 128) * 128)
    pad = mp - n
    if pad:
        obs = jnp.pad(obs, ((0, 0), (0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    # (K, 9, M): row = view*3 + component, landmarks on lanes.
    obs_t = obs.astype(jnp.float32).transpose(0, 2, 3, 1).reshape(k, 9, mp)
    vf = valid.astype(jnp.float32)[:, None, :]  # (K, 1, M)
    poses_in = jnp.concatenate(
        [
            rot1.astype(jnp.float32).reshape(k, 9),
            t1.astype(jnp.float32).reshape(k, 3),
            rot2.astype(jnp.float32).reshape(k, 9),
            t2.astype(jnp.float32).reshape(k, 3),
        ],
        axis=1,
    )  # (K, 24)
    out = pl.pallas_call(
        partial(_tv_kernel, iterations=int(iterations)),
        grid=(k,),
        out_shape=jax.ShapeDtypeStruct((k, 24), jnp.float32),
        in_specs=[
            # SMEM blocks must span the full array; the kernel picks its
            # row with program_id.
            pl.BlockSpec((k, 24), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 9, mp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, mp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (k, 24), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        interpret=interpret,
    )(poses_in, obs_t, vf)
    dt = rot1.dtype
    return (
        out[:, 0:9].reshape(k, 3, 3).astype(dt),
        out[:, 9:12].astype(dt),
        out[:, 12:21].reshape(k, 3, 3).astype(dt),
        out[:, 21:24].astype(dt),
    )


# --- three-view simple L2 with patience (three_view_optimizer.rs:126-200) -----


def _tv_l2_kernel(poses_ref, obs_ref, valid_ref, out_ref, *, rate, iterations):
    """One resident three-view L2 patience loop (single problem).

    Same layouts as :func:`_tv_kernel` with K=1; the delta rule is the
    constant-rate mean gradient and the stop rule is the 4-norm patience of
    optimizers._three_view_loop.
    """
    c = (obs_ref[0, 0:1, :], obs_ref[0, 1:2, :], obs_ref[0, 2:3, :])
    fo = (obs_ref[0, 3:4, :], obs_ref[0, 4:5, :], obs_ref[0, 5:6, :])
    so = (obs_ref[0, 6:7, :], obs_ref[0, 7:8, :], obs_ref[0, 8:9, :])
    vrow = valid_ref[0, 0:1, :]
    vmask = vrow > 0.0
    inv_len = 1.0 / jnp.maximum(jnp.sum(vrow), 1.0)

    def body(carry):
        rf, tf = carry[0:9], carry[9:12]
        rs, ts = carry[12:21], carry[21:24]
        b1, b2, b3, b4, ni, it = carry[24:30]
        ft, fr, st2, sr2 = _tv_tangent_rows(rf, tf, rs, ts, c, fo, so)
        # Masked sums (tangent_new's per-landmark NaN zeroing == exclusion).
        sums = []
        for g in (ft, fr, st2, sr2):
            ok = vmask & ~_v3_isnan_any(g)
            sums.append(_v3_sum(g, ok))
        s_ft, s_fr, s_st, s_sr = sums
        n1, n2, n3, n4 = (_s3_norm(s) for s in sums)
        improved = (b1 > n1) | (b2 > n2) | (b3 > n3) | (b4 > n4)
        ni2 = jnp.where(improved, 0, ni + 1)
        nb = (
            jnp.minimum(b1, n1), jnp.minimum(b2, n2),
            jnp.minimum(b3, n3), jnp.minimum(b4, n4),
        )
        scale = inv_len * rate
        dt1 = tuple(x * scale for x in s_ft)
        dr1 = tuple(x * scale for x in s_fr)
        dt2 = tuple(x * scale for x in s_st)
        dr2 = tuple(x * scale for x in s_sr)
        rf2, tf2 = _apply_tangent_scalars(dt1, dr1, rf, tf)
        rs2, ts2 = _apply_tangent_scalars(dt2, dr2, rs, ts)
        keep = ni2 >= PATIENCE

        def sel(old, new):
            return jnp.where(keep, old, new)

        new_pose = tuple(
            sel(o, n)
            for o, n in zip(rf + tf + rs + ts, rf2 + tf2 + rs2 + ts2)
        )
        return new_pose + nb + (ni2, it + 1)

    def cond(carry):
        ni, it = carry[28], carry[29]
        return (it < iterations) & (ni < PATIENCE)

    inf = jnp.float32(jnp.inf)
    init = tuple(poses_ref[0, i] for i in range(24)) + (
        inf, inf, inf, inf, jnp.int32(0), jnp.int32(0),
    )
    final = jax.lax.while_loop(cond, body, init)
    for i in range(24):
        out_ref[0, i] = final[i]


@partial(jax.jit, static_argnames=("rate", "iterations", "interpret"))
def three_view_l2_resident(
    rot1, t1, rot2, t2, obs, valid, rate: float, iterations: int,
    interpret: bool = False,
):
    """Resident drop-in for :func:`three_view_simple_optimize_l2`'s inner
    loop (single problem; poses ALREADY inverted to camera-to-center; the
    caller inverts back).  ``obs``: (N, 3, 3); ``valid``: (N,)."""
    n = obs.shape[0]
    mp = max(128, -(-n // 128) * 128)
    pad = mp - n
    if pad:
        obs = jnp.pad(obs, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    obs_t = obs.astype(jnp.float32).transpose(1, 2, 0).reshape(1, 9, mp)
    vf = valid.astype(jnp.float32)[None, None, :]
    poses_in = jnp.concatenate(
        [
            rot1.astype(jnp.float32).reshape(9),
            t1.astype(jnp.float32).reshape(3),
            rot2.astype(jnp.float32).reshape(9),
            t2.astype(jnp.float32).reshape(3),
        ]
    )[None, :]  # (1, 24)
    out = pl.pallas_call(
        partial(_tv_l2_kernel, rate=float(rate), iterations=int(iterations)),
        out_shape=jax.ShapeDtypeStruct((1, 24), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(poses_in, obs_t, vf)
    dt = rot1.dtype
    return (
        out[0, 0:9].reshape(3, 3).astype(dt),
        out[0, 9:12].astype(dt),
        out[0, 12:21].reshape(3, 3).astype(dt),
        out[0, 21:24].astype(dt),
    )
