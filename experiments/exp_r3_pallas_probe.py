"""Round-3 device probes: isolate why pallas_fed 500s and what the select
kernels cost standalone.

HISTORICAL / NON-RUNNABLE: the fed1/fedfull/deriv phases import
cv_tpu.akaze.pallas_scale, which these probes' own measurements condemned
(60x slower than XLA) and which was deleted in the same round.  The numbers
live in docs/perf-notes.md (round-3 "device verdicts"); the script is kept
as the record of how they were taken.  The `select` phase still runs.

Phases:
  fed1    — single-tau fed_chain compile+time (octave-0 shape)
  fedfull — full 3-tau chain (evolution 1)
  deriv   — fixed detector_response kernel (edge-pad rewrite)
  select  — standalone select kernels at K=4096, NS=512
Usage: python experiments/exp_r3_pallas_probe.py [phase...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def _sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, n=8):
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


def data(b=8, h=512, w=1392):
    rng = np.random.default_rng(0)
    lt = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(0, 1, (b, h, w)).astype(np.float32))
    return lt, flow


def phase_fed1():
    from cv_tpu.akaze.pallas_scale import fed_chain

    lt, flow = data()
    try:
        ms, cs, out = timeit(lambda a, c: fed_chain(a, c, (0.25,)), lt, flow)
        print(f"fed_chain 1 tau: {ms:.2f} ms (compile {cs:.0f}s)")
    except Exception as e:
        print(f"fed_chain 1 tau: FAILED {type(e).__name__}: {str(e)[:300]}")


def phase_fedfull():
    from cv_tpu.akaze.pallas_scale import fed_chain

    lt, flow = data()
    for n in (3, 10, 17):
        taus = tuple(0.25 / (i + 1) for i in range(n))
        try:
            ms, cs, out = timeit(lambda a, c, t=taus: fed_chain(a, c, t), lt, flow)
            print(f"fed_chain {n} taus: {ms:.2f} ms (compile {cs:.0f}s)")
        except Exception as e:
            print(f"fed_chain {n} taus: FAILED {type(e).__name__}: {str(e)[:300]}")


def phase_deriv():
    from cv_tpu.akaze.pallas_scale import detector_response
    from cv_tpu.ops import image as ops

    lt, _ = data()
    for ss in (1, 2, 4, 7):
        try:
            ms, cs, (lx, ly, ldet) = timeit(
                lambda a, ss=ss: detector_response(a, ss), lt
            )
            # parity vs the XLA chain
            lx2 = ops.scharr_horizontal(lt, ss)
            ly2 = ops.scharr_vertical(lt, ss)
            lxx = ops.scharr_horizontal(lx2, ss)
            lyy = ops.scharr_vertical(ly2, ss)
            lxy = ops.scharr_vertical(lx2, ss)
            ldet2 = (lxx * lyy - lxy * lxy) * jnp.float32(float(ss) ** 4)
            exact = bool(
                jnp.all(lx == lx2) & jnp.all(ly == ly2) & jnp.all(ldet == ldet2)
            )
            print(f"deriv ss={ss}: {ms:.2f} ms (compile {cs:.0f}s) exact={exact}")
        except Exception as e:
            print(f"deriv ss={ss}: FAILED {type(e).__name__}: {str(e)[:300]}")


def phase_select():
    from cv_tpu.akaze import pallas_mldb

    rng = np.random.default_rng(0)
    k, c, ns = 4096, 3, 512
    patches = jnp.asarray(rng.normal(size=(k, c, 128, 128)).astype(np.float32))
    rel_x = jnp.asarray(rng.integers(0, 128, (k, ns)).astype(np.int32))
    rel_y = jnp.asarray(rng.integers(0, 128, (k, ns)).astype(np.int32))
    for name, fn in (
        ("batched(G=8/step)", pallas_mldb.select_samples_batched),
        ("per-keypoint", pallas_mldb.select_samples),
    ):
        try:
            ms, cs, out = timeit(fn, patches, rel_x, rel_y, n=5)
            print(f"select {name}: {ms:.2f} ms (compile {cs:.0f}s) K=4096 NS=512")
        except Exception as e:
            print(f"select {name}: FAILED {type(e).__name__}: {str(e)[:300]}")


PHASES = {
    "fed1": phase_fed1,
    "fedfull": phase_fedfull,
    "deriv": phase_deriv,
    "select": phase_select,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PHASES)
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        try:
            PHASES[nm]()
        except Exception as e:
            print(f"{nm} phase failed: {e}")
