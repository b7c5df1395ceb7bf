"""Fused single-view registration refinement — one XLA program.

TPU-first re-design of the reference's ``register_frame`` filter cascade
(``/root/reference/cv-sfm/src/lib.rs:1452-1812``; the consistency predicate
is ``lib.rs:2937-2967``).  The reference re-optimizes the pose and then
re-filters matches one landmark at a time on the host, five times over.
Here the whole cascade is a single jitted program over padded
``(match, observation)`` tensors: each filter iteration optimizes the pose
over the active match set (masked :func:`single_view_simple_optimize_l2`),
then recomputes the consistency mask for EVERY candidate match in parallel —
batched Linear-Eigen triangulation of (landmark observations + the new
observation) plus the reprojection / bi-landmark gates — and caps the active
set in match order exactly like the reference's early ``break``.

Robust landmark points are pose-independent during the cascade (they come
from the OTHER views' observations only), so they are computed once by the
host batch kernels (:mod:`cv_tpu.sfm.batch_geom`) and passed in.

Through a remote-device tunnel this turns ~12 round trips per registration
into one dispatch + one fetch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import projective, smallmat
from ..core.pose import Isometry3
from ..geom import epipolar
from ..optimize import single_view_simple_optimize_l2
from ..triangulate import linear_eigen


def graph_ba_core(
    rot, trans, edge_to, edge_from, edge_rot, edge_t, edge_valid, iterations, rate
):
    """Graph bundle adjustment loop (lib.rs:1892-1936, 2382-2414, 2543-2567).

    ``rot``/``trans``: (V, 3, 3)/(V, 3) world-to-view poses; ``edge_*``:
    (E,) directed constraints with the expected other->view isometries.
    Runs ``iterations`` rounds: per view, sum the se(3) logs of
    ``expected_other_to_view . world_to_other . view_to_world^-1`` over its
    incident edges, scale by ``rate``, and left-apply.  Views whose delta
    goes non-finite are removed (sticky mask) along with their edges.

    Pure function meant to be called inside a jit (see
    ``engine.graph_ba_device`` and :func:`ba_filter`).
    """
    from ..core.lie import so3_exp, so3_log

    v_count = rot.shape[0]
    has_edge = jnp.zeros((v_count,), bool).at[edge_to].max(edge_valid)

    def body(_, state):
        rot, trans, removed = state
        r_from = rot[edge_from]
        t_from = trans[edge_from]
        r_to = rot[edge_to]
        t_to = trans[edge_to]
        # world_to_other . view_to_world: R = Rf Rt^T, t = tf - Rf Rt^T tt
        r_rel = smallmat.matmul(r_from, jnp.swapaxes(r_to, -1, -2))
        t_rel = t_from - smallmat.matvec(r_rel, t_to)
        r_d = smallmat.matmul(edge_rot, r_rel)
        t_d = smallmat.matvec(edge_rot, t_rel) + edge_t
        se3_log = jnp.concatenate([t_d, so3_log(r_d)], axis=-1)  # (E, 6)
        ok_edge = edge_valid & ~removed[edge_from] & ~removed[edge_to]
        se3_log = jnp.where(ok_edge[:, None], se3_log, 0.0)
        net = jnp.zeros((v_count, 6), rot.dtype).at[edge_to].add(se3_log) * rate
        finite = jnp.all(jnp.isfinite(net), axis=-1) & has_edge & ~removed
        dr = so3_exp(net[:, 3:6])
        dt = net[:, 0:3]
        new_rot = smallmat.matmul(dr, rot)
        new_trans = smallmat.matvec(dr, trans) + dt
        rot = jnp.where(finite[:, None, None], new_rot, rot)
        trans = jnp.where(finite[:, None], new_trans, trans)
        removed = removed | (~finite)
        return rot, trans, removed

    removed0 = ~has_edge
    return jax.lax.fori_loop(0, iterations, body, (rot, trans, removed0))


@partial(jax.jit, static_argnames=("iterations", "rate"))
def ba_filter(
    rot,          # (V, 3, 3) world-to-view poses
    trans,        # (V, 3)
    edge_to,      # (E,) int32
    edge_from,    # (E,) int32
    edge_rot,     # (E, 3, 3) expected other->view isometries
    edge_t,       # (E, 3)
    edge_valid,   # (E,)
    lm_view,      # (L, O) int32 indices into the view arrays
    lm_bear,      # (L, O, 3) observation bearings
    lm_mask,      # (L, O) real observations (front-packed per row)
    lm_valid,     # (L,) real landmark rows
    max_sine,
    max_cos,
    incidence_thresh,
    needed_obs,   # scalar int: min(robust_minimum_observations, n_views)
    iterations: int,
    rate: float,
):
    """Graph BA chained with the observation filter — ONE device program.

    The reference runs ``apply_constraints`` then
    ``filter_non_robust_observations`` as separate host passes over the
    updated poses (lib.rs:2343-2355, 2657-2757).  Every landmark's filter
    verdict depends only on the post-BA poses and its own observations, so
    the whole pass fuses behind the BA loop: gather each observation's
    post-BA pose, run the 2-observation epipolar gate or the >=3 LinearEigen
    triangulation + cosine kicks, and count the robust landmarks the splits
    would leave — one fetch instead of one per stage.

    Returns ``(rot (V,3,3), trans (V,3), removed (V,), kill (L,),
    bad_obs (L,O), robust_count)``:

    - ``kill[l]``: split the whole landmark (2-obs epipolar failure or
      untriangulatable, lib.rs:2680-2695, 2720-2730);
    - ``bad_obs[l, o]``: kick this observation (cosine gate,
      lib.rs:2700-2718);
    - ``robust_count``: ``is_landmark_robust`` survivors AFTER the splits
      (split rows contribute nothing; split-off observations become 1-obs
      landmarks which are never robust), matching the host recount
      (lib.rs:2747-2753).

    The host applies the splits and replays the robust-floor early-out; if
    BA removed any view it falls back to the exact host filter instead (the
    removal changes observation structure mid-pass — rare).
    """
    rot, trans, removed = graph_ba_core(
        rot, trans, edge_to, edge_from, edge_rot, edge_t, edge_valid,
        iterations, rate,
    )
    ro = rot[lm_view]      # (L, O, 3, 3)
    to = trans[lm_view]    # (L, O, 3)
    m = lm_mask & lm_valid[:, None]
    n_obs = jnp.sum(m, axis=1)
    # 2-observation rows: bi-landmark epipolar gate on the (front-packed)
    # first two slots under pose1 . inverse(pose0) (lib.rs:2680-2695).
    r_rel = smallmat.matmul(ro[:, 1], jnp.swapaxes(ro[:, 0], -1, -2))
    t_rel = to[:, 1] - smallmat.matvec(r_rel, to[:, 0])
    a_in_b = smallmat.matvec(r_rel, lm_bear[:, 0])
    two_ok = epipolar.loss(t_rel, a_in_b, lm_bear[:, 1]) < max_sine
    # >=3-observation rows: triangulate and kick cosine outliers.
    poses = Isometry3(rotation=ro, translation=to)
    point, tri_ok = linear_eigen.triangulate_observations(poses, lm_bear, valid=m)
    cam = poses.transform(point[:, None, :])  # (L, O, 4)
    cosd = 1.0 - jnp.sum(projective.bearing(cam) * lm_bear, axis=-1)
    bad = (cosd > max_cos) & m
    two = n_obs == 2
    many = n_obs >= 3
    kill = lm_valid & ((two & ~two_ok) | (many & ~tri_ok))
    bad_obs = jnp.where((many & tri_ok)[:, None], bad, False)
    # Post-split robust recount (lib.rs:2907-2934 over the survivors).
    remaining = m & ~bad_obs & ~kill[:, None]
    # Elementwise world-bearing dots, NOT dot_general: f32 matmuls round to
    # bf16 on the MXU and 1-dot near zero needs full f32.
    wb = smallmat.matvec_t(ro, lm_bear)  # R^T b
    dots = 1.0 - jnp.sum(wb[:, :, None, :] * wb[:, None, :, :], axis=-1)
    pair = remaining[:, :, None] & remaining[:, None, :]
    o = lm_mask.shape[1]
    iu = jnp.triu(jnp.ones((o, o), bool), 1)
    any_pair = jnp.any((dots > incidence_thresh) & pair & iu, axis=(1, 2))
    robust = (
        (jnp.sum(remaining, axis=1) >= needed_obs) & any_pair & lm_valid & ~kill
    )
    robust_count = jnp.sum(robust, dtype=jnp.int32)
    return rot, trans, removed, kill, bad_obs, robust_count


def _optimize_l2(pose, bearings, points, active, rate, patience):
    """The cascade's inner optimizer: the Pallas resident patience loop on
    TPU (one kernel for the whole loop, ~8x the XLA while_loop whose ~50
    small fused kernels per step dominated the engine's steady state —
    docs/perf-notes.md round 4), the XLA loop elsewhere.  Both implement
    single_view_optimizer.rs:80-135; they agree to float rounding."""
    if jax.default_backend() == "tpu":
        from ..optimize.pallas_loop import single_view_l2_resident

        return single_view_l2_resident(
            pose, bearings, points, active, rate, patience
        )
    return single_view_simple_optimize_l2(
        pose, bearings, points, active, rate, patience
    )


def _consistency_mask(
    pose: Isometry3,
    bearings,  # (M, 3) new-frame bearings
    n_others,  # (M,) real observation counts
    obs_rot,   # (M, O, 3, 3) other-view poses
    obs_trans,  # (M, O, 3)
    all_bear,  # (M, O+1, 3) other bearings + new bearing in the last slot
    all_mask,  # (M, O+1) with the last slot always True
    max_sine,
    max_cos,
):
    """``is_observation_consistent`` (lib.rs:2937-2967) for every match."""
    m = bearings.shape[0]
    # Multi-observation path: triangulate others + the new observation and
    # require every reprojection under the cosine gate.
    rot_b = jnp.broadcast_to(pose.rotation, (m, 1, 3, 3))
    t_b = jnp.broadcast_to(pose.translation, (m, 1, 3))
    all_rot = jnp.concatenate([obs_rot, rot_b], axis=1)
    all_t = jnp.concatenate([obs_trans, t_b], axis=1)
    poses = Isometry3(rotation=all_rot, translation=all_t)
    point, ok = linear_eigen.triangulate_observations(poses, all_bear, valid=all_mask)
    cam = poses.transform(point[:, None, :])  # (M, O+1, 4)
    cosd = 1.0 - jnp.sum(projective.bearing(cam) * all_bear, axis=-1)
    multi_ok = ok & jnp.all((cosd < max_cos) | ~all_mask, axis=-1)
    # Single-other path: bi-landmark robustness under other . pose^-1
    # (lib.rs:2940-2951, 1306-1317).
    rot_p_t = jnp.swapaxes(pose.rotation, -1, -2)
    r_rel = smallmat.matmul(obs_rot[:, 0], rot_p_t)
    t_rel = obs_trans[:, 0] - smallmat.matvec(r_rel, pose.translation)
    a_in_b = smallmat.matvec(r_rel, bearings)
    bi_ok = epipolar.loss(t_rel, a_in_b, all_bear[:, 0]) < max_sine
    return jnp.where(n_others == 1, bi_ok, multi_ok)


@partial(
    jax.jit,
    static_argnames=("filter_iterations", "cap", "rate", "patience"),
)
def register_refine(
    rot0,        # (3, 3) consensus pose
    t0,          # (3,)
    bearings,    # (M, 3) new-frame bearing per candidate match
    points,      # (M, 4) robust landmark points (zeros when not robust)
    point_ok,    # (M,) robust_point(landmarks) is not None
    match_valid,  # (M,) real (non-padded) match
    obs_rot,     # (M, O, 3, 3) landmark observations ("others")
    obs_trans,   # (M, O, 3)
    obs_bear,    # (M, O, 3)
    obs_mask,    # (M, O)
    inlier_mask,  # (NB,) consensus inliers over the compacted point_ok subset
    ok_positions,  # (M,) row i's index into the compacted subset (cumsum-1)
    max_sine,
    max_cos,
    filter_iterations: int,
    cap: int,
    rate: float,
    patience: int,
):
    """Run the filter cascade; returns
    ``(rotation, translation, final_consistent (M,), counts
    (filter_iterations,), final_count, final_robust, c0)``.

    The consensus inlier mask arrives in the compacted row space the
    consensus program scored (only robust-point rows are fed to it);
    ``ok_positions`` scatters it back to full match rows on device, so the
    whole consensus -> refine chain needs no host round trip in between.
    ``c0`` is the initial capped active-set size (the reference's
    ``matches_3d`` length after the inlier cut, lib.rs:1625-1641).

    ``counts[i]`` is the active-match count after filter iteration ``i`` —
    the host checks the reference's early-outs (lib.rs:1686-1704) against
    them; no data is mutated until the checks pass, so deferring the checks
    is observationally identical.
    """
    pose0 = Isometry3(rotation=rot0, translation=t0)
    inlier_full = point_ok & inlier_mask[ok_positions]
    init_active = inlier_full & (jnp.cumsum(inlier_full) <= cap)
    c0 = jnp.sum(init_active, dtype=jnp.int32)
    m = bearings.shape[0]
    n_others = jnp.sum(obs_mask, axis=1)
    all_bear = jnp.concatenate([obs_bear, bearings[:, None, :]], axis=1)
    all_mask = jnp.concatenate(
        [obs_mask, jnp.ones((m, 1), bool)], axis=1
    )

    def consistent(pose):
        return _consistency_mask(
            pose, bearings, n_others, obs_rot, obs_trans,
            all_bear, all_mask, max_sine, max_cos,
        )

    def refiltered(pose):
        c = consistent(pose) & point_ok & match_valid
        return c & (jnp.cumsum(c) <= cap)

    def body(i, state):
        pose, active, counts = state
        pose = _optimize_l2(
            pose, bearings, points, active, rate, patience
        )
        active = refiltered(pose)
        counts = counts.at[i].set(jnp.sum(active, dtype=jnp.int32))
        return pose, active, counts

    counts0 = jnp.zeros((filter_iterations,), jnp.int32)
    pose, active, counts = jax.lax.fori_loop(
        0, filter_iterations, body, (pose0, init_active, counts0)
    )
    pose = _optimize_l2(
        pose, bearings, points, active, rate, patience
    )
    fmask = consistent(pose) & match_valid
    final_count = jnp.sum(fmask, dtype=jnp.int32)
    final_robust = jnp.sum(fmask & point_ok, dtype=jnp.int32)
    return (
        pose.rotation,
        pose.translation,
        fmask,
        counts,
        final_count,
        final_robust,
        c0,
    )
