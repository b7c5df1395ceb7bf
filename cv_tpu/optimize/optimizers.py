"""Pose optimizers: single-view (PnP refine) and three-view gradient descent.

Re-design of ``/root/reference/cv-optimize/src/``.  The reference's per-
landmark loops become masked tensor reductions over a fixed landmark budget,
and its data-dependent patience-50 early stop becomes a ``lax.while_loop``
whose body applies updates under the same conditions (the reference breaks
*without* applying on stabilization, and *with* applying on the final
iteration — replicated exactly).

All functions are single-problem but fully batched over landmarks; wrap with
``jax.vmap`` to optimize many problems at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import projective
from ..core.pose import Isometry3
from ..geom import epipolar

PATIENCE = 50


def _norm(v):
    return jnp.linalg.norm(v, axis=-1)


def _apply_tangent(t, r, pose: Isometry3) -> Isometry3:
    """``delta.isometry() * pose`` (single_view_optimizer.rs:72).

    Preserves the pose's frame type so while_loop carries stay type-stable.
    """
    delta = Isometry3.from_tangent(t, r)
    out = delta.compose(pose)
    return type(pose)(rotation=out.rotation, translation=out.translation)


def landmark_deltas(pose: Isometry3, bearings, world_points, valid):
    """Per-landmark se(3) tangents for PnP (single_view_optimizer.rs:4-14).

    Landmarks whose transformed camera point lies at infinity are skipped
    (contribute nothing), matching the reference's Option filter.
    """
    cam = pose.transform(world_points)  # (..., N, 4)
    finite_point = cam[..., 3] != 0.0
    pt = projective.point(cam)
    t, r = epipolar.world_pose_gradient(pt, bearings)
    contrib = valid & finite_point & jnp.all(jnp.isfinite(pt), axis=-1)
    t = jnp.where(contrib[..., None], t, 0.0)
    r = jnp.where(contrib[..., None], r, 0.0)
    return t, r, contrib


@jax.jit
def single_view_simple_optimize_l1(
    pose: Isometry3,
    bearings: jnp.ndarray,  # (N, 3)
    world_points: jnp.ndarray,  # (N, 4)
    valid: jnp.ndarray,  # (N,)
    epsilon: float,
    optimization_rate: float,
    iterations: int,
) -> Isometry3:
    """Weiszfeld-style harmonic-mean IRLS (single_view_optimizer.rs:16-78)."""

    def cond(state):
        pose, bt, br, ni, it = state
        return (it < iterations) & (ni < PATIENCE)

    def body(state):
        pose, bt, br, ni, it = state
        tscale = _norm(pose.translation)
        t, r, contrib = landmark_deltas(pose, bearings, world_points, valid)
        tn = _norm(t)
        rn = _norm(r)
        ts = jnp.sum(jnp.where(contrib, 1.0 / (tn + tscale * epsilon), 0.0))
        rs = jnp.sum(jnp.where(contrib, 1.0 / (rn + epsilon), 0.0))
        t_l1, r_l1 = epipolar.tangent_new(
            t / jnp.where(tn == 0, 1.0, tn)[..., None],
            r / jnp.where(rn == 0, 1.0, rn)[..., None],
        )
        t_l1 = jnp.where(contrib[..., None], t_l1, 0.0)
        r_l1 = jnp.where(contrib[..., None], r_l1, 0.0)
        l1_t = jnp.sum(t_l1, axis=0)
        l1_r = jnp.sum(r_l1, axis=0)
        delta_t = l1_t * optimization_rate / ts
        delta_r = l1_r * optimization_rate / rs

        nt, nr = _norm(l1_t), _norm(l1_r)
        improved = (bt > nt) | (br > nr)
        ni = jnp.where(improved, 0, ni + 1)
        bt = jnp.minimum(bt, nt)
        br = jnp.minimum(br, nr)
        new_pose = _apply_tangent(delta_t, delta_r, pose)
        keep_old = ni >= PATIENCE
        pose = jax.tree_util.tree_map(
            lambda old, new: jnp.where(keep_old, old, new), pose, new_pose
        )
        return pose, bt, br, ni, it + 1

    inf = jnp.inf
    pose, *_ = jax.lax.while_loop(
        cond, body, (pose, jnp.float64(inf).astype(pose.dtype),
                     jnp.float64(inf).astype(pose.dtype), jnp.int32(0), jnp.int32(0))
    )
    return pose


@jax.jit
def single_view_simple_optimize_l2(
    pose: Isometry3,
    bearings: jnp.ndarray,
    world_points: jnp.ndarray,
    valid: jnp.ndarray,
    optimization_rate: float,
    iterations: int,
) -> Isometry3:
    """Plain mean-gradient descent with patience (single_view_optimizer.rs:80-135)."""
    inv_len = 1.0 / jnp.maximum(jnp.sum(valid), 1)

    def cond(state):
        pose, bt, br, ni, it = state
        return (it < iterations) & (ni < PATIENCE)

    def body(state):
        pose, bt, br, ni, it = state
        t, r, contrib = landmark_deltas(pose, bearings, world_points, valid)
        l2_t = jnp.sum(t, axis=0)
        l2_r = jnp.sum(r, axis=0)
        delta_t = l2_t * inv_len * optimization_rate
        delta_r = l2_r * inv_len * optimization_rate

        nt, nr = _norm(l2_t), _norm(l2_r)
        improved = (bt > nt) | (br > nr)
        ni = jnp.where(improved, 0, ni + 1)
        bt = jnp.minimum(bt, nt)
        br = jnp.minimum(br, nr)
        new_pose = _apply_tangent(delta_t, delta_r, pose)
        keep_old = ni >= PATIENCE
        pose = jax.tree_util.tree_map(
            lambda old, new: jnp.where(keep_old, old, new), pose, new_pose
        )
        return pose, bt, br, ni, it + 1

    inf = jnp.inf
    pose, *_ = jax.lax.while_loop(
        cond, body, (pose, jnp.float64(inf).astype(pose.dtype),
                     jnp.float64(inf).astype(pose.dtype), jnp.int32(0), jnp.int32(0))
    )
    return pose


def _three_view_landmark_gradients(ftoc: Isometry3, stoc: Isometry3, observations):
    """Per-landmark tangents for both non-center poses
    (three_view_optimizer.rs:7-21). ``observations``: (N, 3, 3) bearings
    (center, first, second)."""
    c = observations[..., 0, :]
    f = ftoc.rotate(observations[..., 1, :])
    s = stoc.rotate(observations[..., 2, :])
    return epipolar.three_view_gradients(
        c, f, ftoc.translation, s, stoc.translation
    )


def _three_view_loop(poses, observations, valid, iterations, compute_delta):
    """Shared loop: poses are pre-inverted (camera-to-center)."""
    ftoc, stoc = poses

    def cond(state):
        ftoc, stoc, bests, ni, it = state
        return (it < iterations) & (ni < PATIENCE)

    def body(state):
        ftoc, stoc, bests, ni, it = state
        (t1, r1), (t2, r2) = _three_view_landmark_gradients(ftoc, stoc, observations)
        m = valid[..., None]
        t1, r1 = jnp.where(m, t1, 0.0), jnp.where(m, r1, 0.0)
        t2, r2 = jnp.where(m, t2, 0.0), jnp.where(m, r2, 0.0)
        (d1, d2), sums = compute_delta(ftoc, stoc, (t1, r1), (t2, r2))

        nrm = jnp.stack([_norm(x) for x in sums])  # (4,) sum norms
        improved = jnp.any(bests > nrm)
        ni = jnp.where(improved, 0, ni + 1)
        bests = jnp.minimum(bests, nrm)
        new_ftoc = _apply_tangent(d1[0], d1[1], ftoc)
        new_stoc = _apply_tangent(d2[0], d2[1], stoc)
        keep_old = ni >= PATIENCE
        ftoc = jax.tree_util.tree_map(
            lambda old, new: jnp.where(keep_old, old, new), ftoc, new_ftoc
        )
        stoc = jax.tree_util.tree_map(
            lambda old, new: jnp.where(keep_old, old, new), stoc, new_stoc
        )
        return ftoc, stoc, bests, ni, it + 1

    bests0 = jnp.full((4,), jnp.inf, ftoc.dtype)
    ftoc, stoc, *_ = jax.lax.while_loop(
        cond, body, (ftoc, stoc, bests0, jnp.int32(0), jnp.int32(0))
    )
    return ftoc, stoc


@jax.jit
def three_view_simple_optimize_l1(
    poses: tuple,
    observations: jnp.ndarray,
    valid: jnp.ndarray,
    epsilon: float,
    optimization_rate: float,
    iterations: int,
):
    """Weiszfeld L1 three-view optimization (three_view_optimizer.rs:23-124).

    ``poses``: (CameraToCamera center->first, center->second);
    ``observations``: (N, 3, 3).  Returns the optimized pose pair.
    """
    ftoc, stoc = poses[0].inverse(), poses[1].inverse()

    def compute_delta(ftoc, stoc, g1, g2):
        tscale = _norm(ftoc.translation) + _norm(stoc.translation)
        outs = []
        sums = []
        for (t, r) in (g1, g2):
            tn, rn = _norm(t), _norm(r)
            contrib = valid
            ts = jnp.sum(jnp.where(contrib, 1.0 / (tn + tscale * epsilon), 0.0))
            rs = jnp.sum(jnp.where(contrib, 1.0 / (rn + epsilon), 0.0))
            t_l1, r_l1 = epipolar.tangent_new(
                t / jnp.where(tn == 0, 1.0, tn)[..., None],
                r / jnp.where(rn == 0, 1.0, rn)[..., None],
            )
            t_l1 = jnp.where(contrib[..., None], t_l1, 0.0)
            r_l1 = jnp.where(contrib[..., None], r_l1, 0.0)
            st = jnp.sum(t_l1, axis=0)
            sr = jnp.sum(r_l1, axis=0)
            outs.append((st * optimization_rate / ts, sr * optimization_rate / rs))
            sums.extend([st, sr])
        return outs, sums

    ftoc, stoc = _three_view_loop(
        (ftoc, stoc), observations, valid, iterations, compute_delta
    )
    return ftoc.inverse(), stoc.inverse()


@jax.jit
def three_view_simple_optimize_l2(
    poses: tuple,
    observations: jnp.ndarray,
    valid: jnp.ndarray,
    optimization_rate: float,
    iterations: int,
):
    """Mean-gradient three-view optimization (three_view_optimizer.rs:126-200)."""
    ftoc, stoc = poses[0].inverse(), poses[1].inverse()
    inv_len = 1.0 / jnp.maximum(jnp.sum(valid), 1)

    def compute_delta(ftoc, stoc, g1, g2):
        outs = []
        sums = []
        for (t, r) in (g1, g2):
            st = jnp.sum(t, axis=0)
            sr = jnp.sum(r, axis=0)
            outs.append(
                (st * inv_len * optimization_rate, sr * inv_len * optimization_rate)
            )
            sums.extend([st, sr])
        return outs, sums

    ftoc, stoc = _three_view_loop(
        (ftoc, stoc), observations, valid, iterations, compute_delta
    )
    return ftoc.inverse(), stoc.inverse()


@jax.jit
def three_view_adaptive_optimize_l2(
    poses: tuple,
    observations: jnp.ndarray,
    valid: jnp.ndarray,
    iterations: int,
):
    """L2 with adaptive signal-to-noise rate (three_view_optimizer.rs:203-272).

    No patience here — the reference runs a fixed iteration count.
    """
    ftoc, stoc = poses[0].inverse(), poses[1].inverse()
    inv_len = 1.0 / jnp.maximum(jnp.sum(valid), 1)

    def body(i, state):
        ftoc, stoc = state
        (t1, r1), (t2, r2) = _three_view_landmark_gradients(ftoc, stoc, observations)
        m = valid[..., None]
        t1, r1 = jnp.where(m, t1, 0.0), jnp.where(m, r1, 0.0)
        t2, r2 = jnp.where(m, t2, 0.0), jnp.where(m, r2, 0.0)
        new = []
        for pose, (t, r) in ((ftoc, (t1, r1)), (stoc, (t2, r2))):
            mean_t = jnp.sum(t, axis=0) * inv_len
            mean_r = jnp.sum(r, axis=0) * inv_len
            tstd = jnp.sum(jnp.where(valid, _norm(t), 0.0)) * inv_len
            rstd = jnp.sum(jnp.where(valid, _norm(r), 0.0)) * inv_len
            trate = _norm(mean_t) / tstd
            rrate = _norm(mean_r) / rstd
            trate = jnp.where(jnp.isfinite(trate), trate, 0.0)
            rrate = jnp.where(jnp.isfinite(rrate), rrate, 0.0)
            new.append(_apply_tangent(mean_t * trate, mean_r * rrate, pose))
        return new[0], new[1]

    ftoc, stoc = jax.lax.fori_loop(0, iterations, body, (ftoc, stoc))
    return ftoc.inverse(), stoc.inverse()
