"""Round-4: time the patience gradient loops that dominate SfM steady state.

exp_sfm_profile (round 4) put _register_refine_device at 0.39 s/call and
three-view init optimize at 0.22 s/call — both are lax.while_loop patience
loops whose bodies are tiny (a few hundred landmarks of VPU math), so the
per-iteration while_loop overhead (~16 us measured here) dominates.  This
probe times the loops standalone at engine shapes, before and after the
UNROLL-chunked bodies land in optimizers.py.

Usage: python experiments/exp_r4_optloop.py
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
from cv_tpu.core.pose import Isometry3, WorldToCamera, CameraToCamera
from cv_tpu.optimize import (
    single_view_simple_optimize_l2,
    three_view_simple_optimize_l2,
)


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, compile_s, out


def single_view_problem(m=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (m, 3)).astype(np.float32)
    wp = np.concatenate([pts, np.ones((m, 1), np.float32)], axis=1)
    rot = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.1, 0.04])))
    t = np.asarray([0.3, -0.1, 0.05], np.float32)
    cam = pts @ rot.T + t
    bear = cam / np.linalg.norm(cam, axis=1, keepdims=True)
    # Perturbed start pose.
    rot_p = np.asarray(lie.so3_exp(jnp.asarray([0.08, -0.07, 0.06])))
    pose = WorldToCamera(
        rotation=jnp.asarray(rot_p), translation=jnp.asarray(t + 0.05)
    )
    valid = np.ones(m, bool)
    valid[m // 2 :] = False  # half-padded, like the engine buckets
    return pose, jnp.asarray(bear), jnp.asarray(wp), jnp.asarray(valid)


def three_view_problem(n=128, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3)).astype(np.float32)
    obs = np.zeros((n, 3, 3), np.float32)
    poses = []
    for i, tvec in enumerate(([0, 0, 0], [0.4, 0, 0.05], [0.8, 0.05, 0.1])):
        rot = np.asarray(
            lie.so3_exp(jnp.asarray(np.float32([0.02, -0.03, 0.01]) * i))
        )
        cam = (pts - np.float32(tvec)) @ rot.T
        obs[:, i] = cam / np.linalg.norm(cam, axis=1, keepdims=True)
        poses.append((rot, -rot @ np.float32(tvec)))
    p1 = CameraToCamera(
        rotation=jnp.asarray(poses[1][0]), translation=jnp.asarray(poses[1][1] + 0.03)
    )
    p2 = CameraToCamera(
        rotation=jnp.asarray(poses[2][0]), translation=jnp.asarray(poses[2][1] - 0.02)
    )
    valid = np.ones(n, bool)
    return (p1, p2), jnp.asarray(obs), jnp.asarray(valid)


def main():
    print(f"backend: {jax.default_backend()}")
    pose, bear, wp, valid = single_view_problem()
    for iters in (1000, 4000):
        ms, cs, out = timeit(
            single_view_simple_optimize_l2, pose, bear, wp, valid, 1e-2, iters
        )
        print(
            f"single_view_l2 iters={iters}: {ms:8.2f} ms "
            f"({ms * 1e3 / iters:.2f} us/iter cap) compile {cs:.1f}s"
        )
        print(f"  pose t: {np.asarray(out.translation)}")

    poses, obs, valid3 = three_view_problem()
    for iters in (1000, 4000):
        ms, cs, out = timeit(
            three_view_simple_optimize_l2, poses, obs, valid3, 1e-2, iters
        )
        print(
            f"three_view_l2 iters={iters}: {ms:8.2f} ms "
            f"({ms * 1e3 / iters:.2f} us/iter cap) compile {cs:.1f}s"
        )
        print(f"  ftoc t: {np.asarray(out[0].translation)}")


def pallas_main():
    """Device timing: XLA while_loop vs the Pallas resident kernel."""
    from cv_tpu.optimize.pallas_loop import single_view_l2_resident

    print(f"backend: {jax.default_backend()}")
    pose, bear, wp, valid = single_view_problem(m=512)
    for iters in (1000, 4000):
        ms, cs, ref = timeit(
            single_view_simple_optimize_l2, pose, bear, wp, valid, 1e-3, iters
        )
        print(f"xla    iters={iters}: {ms:8.2f} ms  compile {cs:.0f}s")
        ms, cs, out = timeit(
            single_view_l2_resident, pose, bear, wp, valid, 1e-3, iters
        )
        print(f"pallas iters={iters}: {ms:8.2f} ms  compile {cs:.0f}s")
        d = max(
            float(np.abs(np.asarray(ref.rotation) - np.asarray(out.rotation)).max()),
            float(np.abs(np.asarray(ref.translation) - np.asarray(out.translation)).max()),
        )
        print(f"  maxdiff vs xla: {d:.2e}")




def pallas_tv_main():
    """Device timing: XLA vs resident three-view kernels."""
    from cv_tpu.optimize import (
        three_view_adaptive_optimize_l2 as xla_adaptive,
        three_view_simple_optimize_l2 as xla_l2,
    )
    from cv_tpu.optimize.pallas_loop import (
        three_view_adaptive_resident,
        three_view_l2_resident,
    )

    print(f"backend: {jax.default_backend()}")
    poses, obs, valid = three_view_problem(n=128)
    i1, i2 = poses[0].inverse(), poses[1].inverse()
    for iters in (1000,):
        ms, cs, _ = timeit(xla_l2, poses, obs, valid, 1e-3, iters)
        print(f"xla    tv_l2 iters={iters}: {ms:8.2f} ms compile {cs:.0f}s")
        ms, cs, _ = timeit(
            three_view_l2_resident,
            i1.rotation, i1.translation, i2.rotation, i2.translation,
            obs, valid, 1e-3, iters,
        )
        print(f"pallas tv_l2 iters={iters}: {ms:8.2f} ms compile {cs:.0f}s")
        k = 8
        obs_b = jnp.stack([obs] * k)
        val_b = jnp.stack([valid] * k)
        r1 = jnp.stack([i1.rotation] * k); t1 = jnp.stack([i1.translation] * k)
        r2 = jnp.stack([i2.rotation] * k); t2 = jnp.stack([i2.translation] * k)

        def xla_batch(r1, t1, r2, t2, o, v):
            def one(a, b, c, d, e, f):
                o1, o2 = xla_adaptive(
                    (type(poses[0])(rotation=a, translation=b),
                     type(poses[0])(rotation=c, translation=d)), e, f, iters)
                return o1.rotation, o1.translation, o2.rotation, o2.translation
            return jax.vmap(one)(r1, t1, r2, t2, o, v)

        jb = jax.jit(xla_batch)
        ms, cs, _ = timeit(jb, r1, t1, r2, t2, obs_b, val_b)
        print(f"xla    tv_adaptive K=8 iters={iters}: {ms:8.2f} ms compile {cs:.0f}s")
        ms, cs, _ = timeit(
            three_view_adaptive_resident, r1, t1, r2, t2, obs_b, val_b, iters
        )
        print(f"pallas tv_adaptive K=8 iters={iters}: {ms:8.2f} ms compile {cs:.0f}s")


if __name__ == "__main__":
    if "pallas_tv" in sys.argv:
        pallas_tv_main()
    elif "pallas" in sys.argv:
        pallas_main()
    else:
        main()
