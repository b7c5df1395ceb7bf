"""Interpret-mode correctness of the Pallas patch-sample selection kernels
(akaze/pallas_mldb.py) against a plain gather.  The bf16x3 split must be
bit-exact: a one-hot row has a single nonzero, so each pass selects one
split term exactly and the f32 sum reconstructs the sample."""

import jax.numpy as jnp
import numpy as np
import pytest

from cv_tpu.akaze import pallas_mldb


@pytest.mark.parametrize(
    "fn",
    [
        pallas_mldb.select_samples,
        pallas_mldb.select_samples_batched,
        pallas_mldb.select_samples_gather,
    ],
)
def test_select_matches_gather(rng, fn):
    k, c, ns = 16, 3, 128
    patches = rng.normal(size=(k, c, 128, 128)).astype(np.float32)
    rel_x = rng.integers(0, 128, (k, ns)).astype(np.int32)
    rel_y = rng.integers(0, 128, (k, ns)).astype(np.int32)
    out = np.asarray(
        fn(jnp.asarray(patches), jnp.asarray(rel_x), jnp.asarray(rel_y), interpret=True)
    )
    ref = patches[
        np.arange(k)[:, None, None],
        np.arange(c)[None, :, None],
        rel_y[:, None, :],
        rel_x[:, None, :],
    ]
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("w", [1, 4])
def test_select_groups_matches_gather(rng, w):
    """Tile-coherent group kernel: every group reads ONE shared 256x256
    window; slots beyond n_active come back as zero rows."""
    l, c, ng, g, ns = 4, 3, 12, 8, 128
    hp = wp = 384  # 3x3 tiles -> window tiles in [0, 1]
    planes = rng.normal(size=(l, c, hp, wp)).astype(np.float32)
    win_lvl = rng.integers(0, l, ng).astype(np.int32)
    win_ty = rng.integers(0, 2, ng).astype(np.int32)
    win_tx = rng.integers(0, 2, ng).astype(np.int32)
    n_active = rng.integers(0, g + 1, ng).astype(np.int32)
    rel_x = rng.integers(0, 256, (ng, g, ns)).astype(np.int32)
    rel_y = rng.integers(0, 256, (ng, g, ns)).astype(np.int32)
    out = np.asarray(
        pallas_mldb.select_samples_groups(
            jnp.asarray(planes), jnp.asarray(win_lvl), jnp.asarray(win_ty),
            jnp.asarray(win_tx), jnp.asarray(n_active),
            jnp.asarray(rel_x).reshape(ng // w, w * g, ns),
            jnp.asarray(rel_y).reshape(ng // w, w * g, ns),
            interpret=True, w=w,
        )
    ).reshape(ng, g, c, ns)
    for t in range(ng):
        for j in range(g):
            if j < n_active[t]:
                ref = planes[win_lvl[t]][
                    :, 128 * win_ty[t] + rel_y[t, j], 128 * win_tx[t] + rel_x[t, j]
                ]
                np.testing.assert_array_equal(out[t, j], ref)
            else:
                np.testing.assert_array_equal(out[t, j], 0.0)


def test_orient_mldb_groups_matches_highest(rng):
    """The fused group describe must agree with the XLA 'highest' path on
    every VALID slot (invalid slots get deterministic zero samples)."""
    from cv_tpu.akaze import descriptors as desc

    L, hmax, wmax, k = 3, 256, 256, 24
    planes = jnp.asarray(
        rng.normal(size=(L, 3, hmax, wmax)).astype(np.float32)
    )
    lvl = jnp.asarray(rng.integers(0, L, k), jnp.int32)
    width = jnp.full((k,), wmax - 6, jnp.int32)
    height = jnp.full((k,), hmax - 4, jnp.int32)
    xf = jnp.asarray(rng.uniform(40, wmax - 46, k).astype(np.float32))
    yf = jnp.asarray(rng.uniform(40, hmax - 44, k).astype(np.float32))
    scale = jnp.asarray(rng.uniform(1.0, 2.5, k).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=k) < 0.8)

    w_ref, ok_ref, ang_ref = desc.orient_mldb_onehot(
        planes, lvl, width, height, xf, yf, scale, mode="highest"
    )
    ng_cap = -(-k // 8) + L * 4 + 1
    v = np.asarray(valid)
    for w in (1, 4):
        w_g, ok_g, ang_g = desc.orient_mldb_groups(
            planes, lvl, width, height, xf, yf, scale, valid,
            pattern_size=10, ng_cap=ng_cap, w=w,
        )
        np.testing.assert_array_equal(np.asarray(ok_g)[v], np.asarray(ok_ref)[v])
        np.testing.assert_array_equal(np.asarray(ang_g)[v], np.asarray(ang_ref)[v])
        np.testing.assert_array_equal(np.asarray(w_g)[v], np.asarray(w_ref)[v])


@pytest.mark.parametrize("mode", ["pallas", "pgather", "pfused"])
def test_orient_mldb_pallas_mode_matches_highest(rng, mode):
    """orient_mldb_onehot Pallas modes must produce identical words, ok
    masks, and angles to the XLA 'highest' path — all resolve the same
    exact patch samples; only the selection engine differs."""
    from cv_tpu.akaze import descriptors as desc

    L, hmax, wmax, k = 3, 160, 192, 16
    planes = jnp.asarray(
        rng.normal(size=(L, 3, hmax, wmax)).astype(np.float32)
    )
    lvl = jnp.asarray(rng.integers(0, L, k), jnp.int32)
    width = jnp.full((k,), wmax, jnp.int32)
    height = jnp.full((k,), hmax, jnp.int32)
    xf = jnp.asarray(rng.uniform(40, wmax - 40, k).astype(np.float32))
    yf = jnp.asarray(rng.uniform(40, hmax - 40, k).astype(np.float32))
    scale = jnp.asarray(rng.uniform(1.0, 2.5, k).astype(np.float32))

    w_ref, ok_ref, ang_ref = desc.orient_mldb_onehot(
        planes, lvl, width, height, xf, yf, scale, mode="highest"
    )
    w_pl, ok_pl, ang_pl = desc.orient_mldb_onehot(
        planes, lvl, width, height, xf, yf, scale, mode=mode
    )
    np.testing.assert_array_equal(np.asarray(ok_pl), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(ang_pl), np.asarray(ang_ref))
    np.testing.assert_array_equal(np.asarray(w_pl), np.asarray(w_ref))
