"""Parity: batched (landmark x observation) geometry vs the scalar host path.

The engine's rejection cascades (observation filtering lib.rs:2657-2757,
robustness lib.rs:2907-2934, registration consistency lib.rs:2937-2967) were
re-designed as batched kernels in ``cv_tpu.sfm.batch_geom`` /
``cv_tpu.sfm.device_refine``.  These tests pin every batched predicate to the
scalar ``host_geom``-based implementation on randomized geometry, including
degenerate rows (padding, behind-camera points, parallel bearings).
"""

import numpy as np
import pytest

from cv_tpu.sfm import batch_geom, host_geom, se3


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    r = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    t = rng.normal(size=3) * 0.5
    return r, t


def make_scene(rng, n_landmarks=40, n_views=6):
    """Random world points observed from random-ish forward cameras."""
    poses = [random_pose(rng) for _ in range(n_views)]
    obs_lists = []
    for _ in range(n_landmarks):
        k = rng.integers(1, n_views + 1)
        views = rng.choice(n_views, size=k, replace=False)
        point = rng.normal(size=3) * 2 + np.array([0, 0, 8.0])
        obs = []
        for v in views:
            r, t = poses[v]
            cam = r @ point + t
            b = cam / np.linalg.norm(cam)
            # a few noisy/bad bearings to hit failure paths
            if rng.random() < 0.15:
                b = rng.normal(size=3)
                b /= np.linalg.norm(b)
            obs.append((v, b))
        obs_lists.append(obs)
    return poses, obs_lists


def pack(poses, obs_lists):
    vp = {v: p for v, p in enumerate(poses)}
    # view_bearings path expects (view, feature); build per-view tables
    feats = {v: [] for v in vp}
    keyed = []
    for obs in obs_lists:
        row = []
        for v, b in obs:
            feats[v].append(b)
            row.append((v, len(feats[v]) - 1))
        keyed.append(row)
    vb = {v: np.asarray(bl).reshape(-1, 3) for v, bl in feats.items()}
    return batch_geom.pack_observations(keyed, vp, vb)


def test_triangulate_batch_matches_scalar(rng):
    poses, obs_lists = make_scene(rng)
    rot, trans, bear, mask, _, _ = pack(poses, obs_lists)
    pts, ok = batch_geom.triangulate_batch(rot, trans, bear, mask)
    for i, obs in enumerate(obs_lists):
        plist = [poses[v] for v, _ in obs]
        blist = [b for _, b in obs]
        ref = host_geom.triangulate_observations(plist, blist)
        assert bool(ok[i]) == (ref is not None), f"row {i}"
        if ref is not None:
            np.testing.assert_allclose(pts[i], ref, atol=1e-9)


def test_incidence_robust_matches_scalar(rng):
    poses, obs_lists = make_scene(rng)
    rot, trans, bear, mask, _, _ = pack(poses, obs_lists)
    thresh = 0.01
    for min_obs in (2, 3):
        got = batch_geom.incidence_robust_batch(rot, bear, mask, thresh, min_obs)
        for i, obs in enumerate(obs_lists):
            wb = [poses[v][0].T @ b for v, b in obs]
            expect = len(obs) >= min_obs and any(
                1.0 - float(wb[a] @ wb[b]) > thresh
                for a in range(len(wb))
                for b in range(a + 1, len(wb))
            )
            assert bool(got[i]) == expect, (i, min_obs)


def test_epipolar_and_bi_robust_match_scalar(rng):
    n = 64
    t = rng.normal(size=(n, 3))
    a = rng.normal(size=(n, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(n, 3))
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    # exercise the NaN fallback with zero translations on a few rows
    t[:4] = 0.0
    got = batch_geom.epipolar_loss_batch(t, a, b)
    for i in range(n):
        assert got[i] == pytest.approx(
            host_geom.epipolar_loss(t[i], a[i], b[i]), abs=1e-12
        )


def test_reproject_cosine_matches_transform_bearing(rng):
    poses, obs_lists = make_scene(rng, n_landmarks=20)
    rot, trans, bear, mask, _, _ = pack(poses, obs_lists)
    pts, ok = batch_geom.triangulate_batch(rot, trans, bear, mask)
    cosd = batch_geom.reproject_cosine_batch(rot, trans, bear, mask, pts)
    for i, obs in enumerate(obs_lists):
        if not ok[i]:
            continue
        for j, (v, b) in enumerate(obs):
            expect = 1.0 - float(host_geom.transform_bearing(poses[v], pts[i]) @ b)
            assert cosd[i, j] == pytest.approx(expect, abs=1e-9)


def test_ba_filter_matches_host_chain(rng):
    """The fused BA + observation-filter program (device_refine.ba_filter)
    must agree with the unfused chain: graph_ba_device then the host
    batch_geom filter math over the post-BA poses (lib.rs:2343-2355 +
    2657-2757), including the post-split robust recount."""
    import jax.numpy as jnp

    from cv_tpu.sfm import device_refine
    from cv_tpu.sfm.engine import graph_ba_device

    n_views, n_lms, iters, rate = 6, 48, 50, 0.01
    poses, obs_lists = make_scene(rng, n_landmarks=n_lms, n_views=n_views)
    obs_lists = [o for o in obs_lists if len(o) >= 2]
    n = len(obs_lists)
    rot0 = np.stack([p[0] for p in poses])
    trans0 = np.stack([p[1] for p in poses])
    # random-ish consistent edge constraints: perturbed relative poses
    edges = []
    for a in range(n_views):
        for b in range(n_views):
            if a != b and rng.random() < 0.5:
                rrel, trel = batch_geom.relative_pose_batch(
                    rot0[None, b], trans0[None, b], rot0[None, a], trans0[None, a]
                )
                edges.append((a, b, rrel[0], trel[0] + rng.normal(size=3) * 0.01))
    e = len(edges)
    edge_to = np.asarray([x[0] for x in edges], np.int32)
    edge_from = np.asarray([x[1] for x in edges], np.int32)
    edge_rot = np.stack([x[2] for x in edges])
    edge_t = np.stack([x[3] for x in edges])
    edge_valid = np.ones(e, bool)

    o = max(len(x) for x in obs_lists)
    lm_view = np.zeros((n, o), np.int32)
    lm_bear = np.zeros((n, o, 3))
    lm_bear[:, :, 2] = 1.0
    lm_mask = np.zeros((n, o), bool)
    for i, obs in enumerate(obs_lists):
        for j, (v, b) in enumerate(obs):
            lm_view[i, j] = v
            lm_bear[i, j] = b
            lm_mask[i, j] = True
    lm_valid = np.ones(n, bool)

    max_sine, max_cos, inc_thresh, needed = 0.05, 1e-3, 0.01, 3
    out = device_refine.ba_filter(
        jnp.asarray(rot0), jnp.asarray(trans0),
        jnp.asarray(edge_to), jnp.asarray(edge_from),
        jnp.asarray(edge_rot), jnp.asarray(edge_t), jnp.asarray(edge_valid),
        jnp.asarray(lm_view), jnp.asarray(lm_bear),
        jnp.asarray(lm_mask), jnp.asarray(lm_valid),
        max_sine, max_cos, inc_thresh, jnp.int32(needed),
        iterations=iters, rate=rate,
    )
    f_rot, f_trans, f_removed, f_kill, f_bad, f_robust = map(np.asarray, out)

    # --- unfused replay -------------------------------------------------
    h_rot, h_trans, h_removed = map(
        np.asarray,
        graph_ba_device(
            jnp.asarray(rot0), jnp.asarray(trans0),
            jnp.asarray(edge_to), jnp.asarray(edge_from),
            jnp.asarray(edge_rot), jnp.asarray(edge_t), jnp.asarray(edge_valid),
            iterations=iters, rate=rate,
        ),
    )
    np.testing.assert_array_equal(f_removed, h_removed)
    assert not h_removed.any()  # scene built so every view keeps its edges
    np.testing.assert_allclose(f_rot, h_rot, atol=1e-12)
    np.testing.assert_allclose(f_trans, h_trans, atol=1e-12)

    rot_l = h_rot[lm_view]
    trans_l = h_trans[lm_view]
    n_obs = lm_mask.sum(axis=1)
    kill = np.zeros(n, bool)
    bad = np.zeros((n, o), bool)
    two = np.nonzero(n_obs == 2)[0]
    if two.size:
        rrel, trel = batch_geom.relative_pose_batch(
            rot_l[two, 0], trans_l[two, 0], rot_l[two, 1], trans_l[two, 1]
        )
        ok2 = batch_geom.bi_robust_batch(
            rrel, trel, lm_bear[two, 0], lm_bear[two, 1], max_sine
        )
        kill[two[~ok2]] = True
    many = np.nonzero(n_obs >= 3)[0]
    if many.size:
        pts, ok3 = batch_geom.triangulate_batch(
            rot_l[many], trans_l[many], lm_bear[many], lm_mask[many]
        )
        cosd = batch_geom.reproject_cosine_batch(
            rot_l[many], trans_l[many], lm_bear[many], lm_mask[many], pts
        )
        kill[many[~ok3]] = True
        rows_ok = many[ok3]
        bad[rows_ok] = (cosd[ok3] > max_cos) & lm_mask[rows_ok]
    np.testing.assert_array_equal(f_kill[:n], kill)
    np.testing.assert_array_equal(f_bad[:n], bad)

    remaining = lm_mask & ~bad & ~kill[:, None]
    robust = batch_geom.incidence_robust_batch(
        rot_l, lm_bear, remaining, inc_thresh, needed
    ) & ~kill
    assert int(f_robust) == int(robust.sum())
