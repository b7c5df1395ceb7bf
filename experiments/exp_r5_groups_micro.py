"""Round-5: decompose the 'pgroups' describe cost at the bench shape.

Times, as separate jitted programs on the real sel/table data of the B=8
KITTI batch: the group-table build, the padded-rel gathers, the group
select kernel (orientation and M-LDB passes) at several w, and the
output un-permute gather — so the M=512 tie (exp_r5_pgroups) gets an
attributable breakdown.

Usage: python experiments/exp_r5_groups_micro.py [w...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cv_tpu.akaze import Akaze, load_gray, to_gray_f32, descriptors as desc
from cv_tpu.akaze import fast, pallas_mldb
from cv_tpu.akaze.scale_space import build_scale_space
from cv_tpu.utils.fixtures import fixture_path


def timeit(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    ws = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    img0 = to_gray_f32(load_gray(fixture_path("0000000000.png")))
    img14 = to_gray_f32(load_gray(fixture_path("0000000014.png")))
    batch = jnp.stack([jnp.asarray(img0), jnp.asarray(img14)] * 4)
    ex = fast.DeviceExtractor(Akaze.sparse(), candidate_budget=256, max_features=512)
    cfg = ex.config
    h, w_img = img0.shape
    specs = ex._helper.specs(h, w_img)
    b = batch.shape[0]
    n_evo = len(specs)

    @jax.jit
    def upstream(images):
        planes = build_scale_space(cfg, specs, images)
        k = ex.candidate_budget
        cand = fast.stage_candidates(cfg, specs, planes, k, ex.topk_method)
        cand = fast.stage_dedup(cand, k, ex.dedup_scan_cap)
        sel = fast.stage_refine_select(cfg, specs, cand, planes, k, ex.max_features)
        stack = fast.padded_plane_stack(planes)
        return stack, sel

    stack, sel = jax.block_until_ready(upstream(batch))
    np.asarray(sel["resp"][0, 0])
    hp, wp = stack.shape[-2], stack.shape[-1]
    ht, wt = hp // 128, wp // 128
    m = ex.max_features
    k_total = b * m
    ng_cap = -(-k_total // 8) + desc.window_catalog_size(specs, b, hp, wp) + 1
    lvl = (jnp.arange(b, dtype=jnp.int32)[:, None] * n_evo + sel["cls"]).reshape(-1)
    xf = (sel["px"] / sel["pw"]).reshape(-1)
    yf = (sel["py"] / sel["pw"]).reshape(-1)
    args = (
        lvl, sel["w"].reshape(-1), sel["h"].reshape(-1), xf, yf,
        sel["ssamp"].reshape(-1), sel["valid"].reshape(-1),
    )

    for w in ws:
        ngw = -(-ng_cap // w)

        @jax.jit
        def tables(lvl, wid, hei, xf, yf, sc, valid, w=w):
            p = 128
            y0 = jnp.clip(yf.astype(jnp.int32) - p // 2, 0, hp - p)
            x0 = jnp.clip(xf.astype(jnp.int32) - p // 2, 0, wp - p)
            ty = jnp.clip(y0 // p, 0, ht - 2)
            tx = jnp.clip(x0 // p, 0, wt - 2)
            return desc._group_tables(
                lvl.astype(jnp.int32), ty, tx, valid, ht, wt, 8, ng_cap, w
            )

        t_tab, tabs = timeit(tables, *args)
        perm, win_lvl, win_ty, win_tx, n_active, src_of, p_of = tabs
        n_real = int(np.asarray(jnp.sum(n_active > 0)))

        uk, ul, _, _ = desc.mldb_unique_tables(10)
        ns_pad = -(-len(uk) // 128) * 128
        rng = np.random.default_rng(0)
        rel_x = jnp.asarray(rng.integers(0, 256, (k_total, ns_pad)), jnp.int32)
        rel_y = jnp.asarray(rng.integers(0, 256, (k_total, ns_pad)), jnp.int32)

        @jax.jit
        def pad_rel(rel, src_of=src_of, ngw=ngw, w=w):
            return rel[src_of].reshape(ngw, w * 8, rel.shape[1])

        t_pad, rx_p = timeit(pad_rel, rel_x)
        _, ry_p = timeit(pad_rel, rel_y)

        def kern_mldb(rx_p, ry_p):
            return pallas_mldb.select_samples_groups(
                stack, win_lvl, win_ty, win_tx, n_active, rx_p, ry_p, w=w
            )

        t_mldb, vals = timeit(kern_mldb, rx_p, ry_p)

        orel = jnp.asarray(rng.integers(0, 256, (k_total, 128)), jnp.int32)
        orel_p = pad_rel(orel)

        def kern_or(orel_p):
            return pallas_mldb.select_samples_groups(
                stack, win_lvl, win_ty, win_tx, n_active, orel_p, orel_p, c0=1, w=w
            )

        t_or, _ = timeit(kern_or, orel_p)

        @jax.jit
        def unperm(vals, p_of=p_of):
            return vals[p_of]

        t_un, _ = timeit(unperm, vals)
        print(
            f"w={w}: tables {t_tab:6.2f} ms | pad_rel {t_pad:5.2f} x2 | "
            f"mldb kern {t_mldb:6.2f} | orient kern {t_or:6.2f} | "
            f"unperm {t_un:5.2f} | real groups {n_real}/{ng_cap}",
            flush=True,
        )


if __name__ == "__main__":
    main()
