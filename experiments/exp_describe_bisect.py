"""Bisect stage_describe's 25.8ms: stack build vs selection vs something else."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import sys

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import fast
from cv_tpu.akaze import descriptors as desc
from cv_tpu.akaze.config import Akaze, allocate_evolutions

B, H, W, M = 8, 512, 1392, 512


def _sync(out):
    # block_until_ready does NOT block on axon; a 1-element device->host
    # copy of the last program's output does (programs complete in order).
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, args_fn, n=10):
    out = fn(*args_fn(0))
    _sync(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args_fn(i))
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = Akaze.sparse()
    specs = allocate_evolutions(cfg, W, H)
    n_evo = len(specs)
    rng = np.random.default_rng(0)

    class P:  # minimal stand-in for EvolutionPlanes
        def __init__(self, spec, h, w):
            self.spec = spec
            self.ldet = jnp.zeros((B, h, w), np.float32)
            self.lt = jnp.asarray(rng.normal(size=(B, h, w)).astype(np.float32))
            self.lx = jnp.asarray(rng.normal(size=(B, h, w)).astype(np.float32))
            self.ly = jnp.asarray(rng.normal(size=(B, h, w)).astype(np.float32))

    planes = [
        P(s, H // 2**s.octave, W // 2**s.octave) for s in specs
    ]

    t = fast.slot_tables(cfg, specs, 256)
    cls = rng.integers(0, n_evo, (B, M)).astype(np.int32)
    sw = t["width"][cls]
    sh = t["height"][cls]
    sel = dict(
        resp=jnp.asarray(rng.uniform(0.001, 0.01, (B, M)).astype(np.float32)),
        cls=jnp.asarray(cls),
        base=jnp.asarray(t["base"][cls]),
        w=jnp.asarray(sw),
        h=jnp.asarray(sh),
        pw=jnp.asarray(t["power"][cls]),
        size=jnp.asarray(t["size2x"][cls]),
        ssamp=jnp.asarray(t["ssamp"][cls]),
        oct=jnp.asarray(t["octave"][cls]),
        px=jnp.asarray(
            rng.uniform(70, 400, (B, M)).astype(np.float32) * t["power"][cls]
        ),
        py=jnp.asarray(
            rng.uniform(70, 300, (B, M)).astype(np.float32) * t["power"][cls]
        ),
        valid=jnp.ones((B, M), bool),
    )
    # keep px within plane bounds
    sel["px"] = jnp.minimum(sel["px"], (sw - 70).astype(np.float32) * t["power"][cls])
    sel["py"] = jnp.minimum(sel["py"], (sh - 70).astype(np.float32) * t["power"][cls])

    plane_list = [p.lt for p in planes] + [p.lx for p in planes] + [p.ly for p in planes]

    from types import SimpleNamespace

    specs_l = [p.spec for p in planes]
    tree = [(p.ldet, p.lt, p.lx, p.ly) for p in planes]

    def rebuild(tr):
        return [
            SimpleNamespace(spec=sp, ldet=a, lt=b, lx=c, ly=d)
            for sp, (a, b, c, d) in zip(specs_l, tr)
        ]

    # 1. full stage_describe
    def full(eps, tr):
        sel2 = dict(sel)
        sel2["px"] = sel["px"] + eps
        return fast.stage_describe(cfg, rebuild(tr), sel2, sampler="onehot")

    ms = timeit(jax.jit(full), lambda i: (jnp.float32(0.001 * i), tree))
    print(f"stage_describe total: {ms:.2f} ms", flush=True)

    # 2. stack build alone
    def stack_full(eps, tr):
        s = fast.padded_plane_stack(rebuild(tr))
        return s + eps  # force materialization

    ms = timeit(jax.jit(stack_full), lambda i: (jnp.float32(0.001 * i), tree))
    print(f"padded_plane_stack (materialized): {ms:.2f} ms", flush=True)

    # 3. orient_mldb_onehot on prebuilt stack
    stack = jax.jit(lambda tr: fast.padded_plane_stack(rebuild(tr)))(tree)
    lvl = (jnp.arange(B, dtype=jnp.int32)[:, None] * n_evo + sel["cls"]).reshape(-1)
    xf = (sel["px"] / sel["pw"]).reshape(-1)
    yf = (sel["py"] / sel["pw"]).reshape(-1)

    def sel_only(eps, st):
        return desc.orient_mldb_onehot(
            st, lvl, sel["w"].reshape(-1), sel["h"].reshape(-1),
            xf + eps, yf, sel["ssamp"].reshape(-1), pattern_size=10,
        )

    ms = timeit(jax.jit(sel_only), lambda i: (jnp.float32(0.001 * i), stack))
    print(f"orient_mldb_onehot on prebuilt stack: {ms:.2f} ms")


if __name__ == "__main__":
    main()
