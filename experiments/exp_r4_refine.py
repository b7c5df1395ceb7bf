"""Round-4: decompose register_refine's 0.39 s/call at engine shapes.

Times, standalone on the device at a representative registration shape
(M=512 matches, O=16 observation slots):
  - register_refine (the fused cascade)
  - single_view_simple_optimize_l2 alone at (M,) with iterations=4000
  - the consistency mask alone (triangulation + gates over all matches)
Usage: python experiments/exp_r4_refine.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, "/root/repo")

from cv_tpu.core import lie
from cv_tpu.core.pose import Isometry3
from cv_tpu.optimize import single_view_simple_optimize_l2
from cv_tpu.sfm import device_refine


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=5, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    _sync(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, compile_s, out


def problem(m=512, o=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (m, 3)).astype(np.float32)
    wp = np.concatenate([pts, np.ones((m, 1), np.float32)], axis=1)
    rot = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.04])))
    t = np.asarray([0.3, -0.1, 0.05], np.float32)
    cam = pts @ rot.T + t
    bear = (cam / np.linalg.norm(cam, axis=1, keepdims=True)).astype(np.float32)
    # Observations from o other views around identity.
    obs_rot = np.zeros((m, o, 3, 3), np.float32)
    obs_trans = np.zeros((m, o, 3), np.float32)
    obs_bear = np.zeros((m, o, 3), np.float32)
    obs_mask = np.zeros((m, o), bool)
    for j in range(3):  # 3 real observations per match, rest padding
        r_j = np.asarray(lie.so3_exp(jnp.asarray(np.float32([0.01, 0.02, -0.01]) * j)))
        t_j = np.float32([0.1 * j, 0.0, 0.02 * j])
        cam_j = pts @ r_j.T + t_j
        obs_rot[:, j] = r_j
        obs_trans[:, j] = t_j
        obs_bear[:, j] = cam_j / np.linalg.norm(cam_j, axis=1, keepdims=True)
        obs_mask[:, j] = True
    inlier_mask = np.zeros(m, bool)
    inlier_mask[:256] = True
    rot_p = np.asarray(lie.so3_exp(jnp.asarray([0.06, -0.09, 0.05])))
    return dict(
        rot0=jnp.asarray(rot_p),
        t0=jnp.asarray(t + 0.03),
        bearings=jnp.asarray(bear),
        points=jnp.asarray(wp),
        point_ok=jnp.ones(m, bool),
        match_valid=jnp.ones(m, bool),
        obs_rot=jnp.asarray(obs_rot),
        obs_trans=jnp.asarray(obs_trans),
        obs_bear=jnp.asarray(obs_bear),
        obs_mask=jnp.asarray(obs_mask),
        inlier_mask=jnp.asarray(inlier_mask),
        ok_positions=jnp.arange(m, dtype=jnp.int32),
    )


def main():
    print(f"backend: {jax.default_backend()}")
    p = problem()
    ms, cs, out = timeit(
        device_refine.register_refine,
        p["rot0"], p["t0"], p["bearings"], p["points"], p["point_ok"],
        p["match_valid"], p["obs_rot"], p["obs_trans"], p["obs_bear"],
        p["obs_mask"], p["inlier_mask"], p["ok_positions"],
        1e-4, 1e-5,
        filter_iterations=5, cap=256, rate=1e-3, patience=4000,
    )
    print(f"register_refine (5 filters, patience 4000): {ms:8.1f} ms  compile {cs:.0f}s")
    print(f"  counts: {np.asarray(out[3])}, final {int(out[4])}")

    pose = Isometry3(rotation=p["rot0"], translation=p["t0"])
    ms, cs, _ = timeit(
        single_view_simple_optimize_l2,
        pose, p["bearings"], p["points"], p["init_active"], 1e-3, 4000,
    )
    print(f"single_view_l2 alone (M=512, 4000 iters): {ms:8.1f} ms  compile {cs:.0f}s")

    # Consistency mask alone.
    m = p["bearings"].shape[0]
    all_bear = jnp.concatenate([p["obs_bear"], p["bearings"][:, None, :]], axis=1)
    all_mask = jnp.concatenate([p["obs_mask"], jnp.ones((m, 1), bool)], axis=1)
    n_others = jnp.sum(p["obs_mask"], axis=1)

    @jax.jit
    def mask_once(rot, t):
        return device_refine._consistency_mask(
            Isometry3(rotation=rot, translation=t),
            p["bearings"], n_others, p["obs_rot"], p["obs_trans"],
            all_bear, all_mask, 1e-4, 1e-5,
        )

    ms, cs, _ = timeit(mask_once, p["rot0"], p["t0"])
    print(f"consistency mask alone (M=512, O=17): {ms:8.2f} ms  compile {cs:.0f}s")


if __name__ == "__main__":
    main()
