"""Per-stage cross-validation of cv_tpu AKAZE against the NumPy oracle port
of the reference Rust implementation (tests/oracle_akaze.py) at the DEFAULT
0.001 threshold on the KITTI pair — the harness SURVEY.md §7 (hard part 1)
prescribes.  The sparse-threshold (0.01) goldens are reference-anchored
elsewhere (tests/test_akaze.py); this file anchors the default-threshold
self-goldens (3425/2908) that previously had no independent oracle.

The oracle and cv_tpu differ in f32 summation ORDER inside convolutions
(SIMD-FMA lanes vs XLA reductions vs numpy pairwise), so plane comparisons
use last-ULP-scale tolerances and the keypoint-set comparisons allow a
<=0.2% fringe of near-tie flips; counts and golden anchors are exact.
"""

from cv_tpu.utils.fixtures import fixture_path
import numpy as np
import pytest

import oracle_akaze as oracle

KITTI_0 = fixture_path("0000000000.png")
KITTI_14 = fixture_path("0000000014.png")


def _plane_close(a, b, rel=2e-5, name=""):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-12)
    err = np.abs(a - b).max() / scale
    assert err < rel, f"{name}: rel err {err:.3e} (scale {scale:.3e})"


@pytest.fixture(scope="module")
def kitti0_stages():
    """Oracle evolutions + cv_tpu evolutions for KITTI frame 0 at 0.001."""
    import jax.numpy as jnp

    from cv_tpu.akaze import Akaze, AkazeExtractor, load_gray
    from cv_tpu.akaze import extrema as cv_extrema
    from cv_tpu.akaze.extract import to_gray_f32

    img = to_gray_f32(load_gray(KITTI_0))  # unit-range f32, like the pipeline
    h, w = img.shape

    cfg = {
        "base_scale_offset": 1.6,
        "contrast_percentile": 0.7,
        "contrast_factor_num_bins": 300,
    }
    evs = oracle.allocate_evolutions(w, h)
    contrast = oracle.create_nonlinear_scale_space(evs, img, cfg)
    oracle.detector_response(evs)

    ex = AkazeExtractor(Akaze())  # default threshold 0.001
    lts, lxs, lys, ldets, masks = ex._scale_space_program(jnp.asarray(img), h, w)
    specs = ex.specs(h, w)
    cands = cv_extrema.extract_candidates(specs, masks, ldets)
    kps = cv_extrema.dedup_keypoints_exact(cands, ex.config.derivative_factor)
    return {
        "img": img,
        "oracle_evs": evs,
        "oracle_contrast": contrast,
        "cv": dict(lts=lts, lxs=lxs, lys=lys, ldets=ldets, specs=specs, kps=kps),
        "extractor": ex,
    }


@pytest.mark.slow
class TestOracleStages:
    def test_layout_and_fed_tau(self, kitti0_stages):
        """Evolution layout + FED tau schedules (evolution.rs:78-127,
        fed_tau.rs:27-93) must agree exactly."""
        evs = kitti0_stages["oracle_evs"]
        specs = kitti0_stages["cv"]["specs"]
        assert len(evs) == len(specs)
        for ev, spec in zip(evs, specs):
            assert ev.octave == spec.octave
            assert ev.sublevel == spec.sublevel
            assert np.isclose(ev.esigma, spec.esigma, rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(ev.fed_tau_steps),
                np.asarray(spec.fed_tau_steps),
                rtol=1e-12,
                err_msg=f"fed tau mismatch at evolution {spec.index}",
            )

    def test_contrast_factor(self, kitti0_stages):
        """contrast_factor.rs:16-64 vs scale_space.compute_contrast_factor."""
        import jax.numpy as jnp

        from cv_tpu.akaze import scale_space

        k_cv = float(
            scale_space.compute_contrast_factor(
                jnp.asarray(kitti0_stages["img"]), 0.7, 1.0, 300
            )
        )
        k_or = kitti0_stages["oracle_contrast"]
        # The oracle's is post-octave-decay; recompute the initial one.
        k0 = oracle.compute_contrast_factor(kitti0_stages["img"], 0.7, 1.0, 300)
        assert abs(k_cv - k0) / k0 < 1e-4, (k_cv, k0)
        assert k_or <= k0  # decayed by 0.75 per octave

    def test_scale_space_planes(self, kitti0_stages):
        """Lt / multiscale Lx / Ly / Ldet per evolution within ULP-scale
        tolerance (lib.rs:189-253, detector_response.rs:8-57)."""
        evs = kitti0_stages["oracle_evs"]
        cv = kitti0_stages["cv"]
        for i, ev in enumerate(evs):
            _plane_close(cv["lts"][i], ev.lt, name=f"Lt[{i}]")
            _plane_close(cv["lxs"][i], ev.lx, name=f"Lx[{i}]")
            _plane_close(cv["lys"][i], ev.ly, name=f"Ly[{i}]")
            _plane_close(cv["ldets"][i], ev.ldet, rel=5e-5, name=f"Ldet[{i}]")

    def test_extrema_and_dedup(self, kitti0_stages):
        """Candidate scan + sequential dedup (scale_space_extrema.rs:14-143):
        counts exact, positions equal up to a <=0.2% near-tie fringe."""
        evs = kitti0_stages["oracle_evs"]
        kps_or = oracle.find_scale_space_extrema(evs, 0.001)
        kps_cv = kitti0_stages["cv"]["kps"]
        n_or = len(kps_or)
        n_cv = len(kps_cv["response"])
        assert abs(n_or - n_cv) <= max(2, int(0.002 * n_or)), (n_or, n_cv)
        set_or = {(kp["class_id"], kp["ix"], kp["iy"]) for kp in kps_or}
        set_cv = {
            (int(c), int(x), int(y))
            for c, (x, y) in zip(kps_cv["class_id"], kps_cv["ixy"])
        }
        sym = set_or ^ set_cv
        assert len(sym) <= max(4, int(0.004 * n_or)), (
            len(sym),
            sorted(sym)[:10],
        )


@pytest.mark.slow
class TestOracleGoldens:
    """Anchor the default-threshold self-goldens end-to-end: the oracle must
    reproduce the pinned keypoint counts, positions, and descriptor bits."""

    @pytest.mark.parametrize(
        "path,count", [(KITTI_0, 3425), (KITTI_14, 2908)], ids=["f0", "f14"]
    )
    def test_default_threshold_counts(self, path, count):
        from cv_tpu.akaze import Akaze, AkazeExtractor, load_gray
        from cv_tpu.akaze.extract import to_gray_f32

        img = to_gray_f32(load_gray(path))
        kps_or, desc_or, _ = oracle.extract(img, detector_threshold=0.001)
        ex = AkazeExtractor(Akaze())
        kp_cv, words_cv = ex.extract(img)
        n_cv = len(kp_cv["response"])

        # Exact self-golden anchor for cv_tpu; near-exact for the oracle
        # (summation-order flips at the detector threshold are possible but
        # must stay in a tiny fringe).
        assert n_cv == count
        assert abs(len(kps_or) - count) <= max(2, int(0.002 * count)), len(kps_or)

        # Match keypoints by position (nearest within 0.01 px) and compare
        # descriptors bit-for-bit.
        pos_or = np.array([[kp["x"], kp["y"]] for kp in kps_or], np.float32)
        cls_or = np.array([kp["class_id"] for kp in kps_or])
        pos_cv = np.asarray(kp_cv["point"], np.float32)
        cls_cv = np.asarray(kp_cv["class_id"])
        words_or = np.frombuffer(b"".join(desc_or), np.uint8).reshape(-1, 64)
        words_or = words_or.view("<u4")  # same little-endian bit layout

        matched = 0
        bit_diffs = []
        ang_diffs = []
        for i in range(len(kps_or)):
            cand = np.nonzero(cls_cv == cls_or[i])[0]
            if len(cand) == 0:
                continue
            d = np.abs(pos_cv[cand] - pos_or[i]).max(axis=1)
            j = cand[np.argmin(d)]
            if d.min() > 0.01:
                continue
            matched += 1
            xor = words_or[i] ^ np.asarray(words_cv[j])
            bit_diffs.append(int(sum(bin(int(v)).count("1") for v in xor)))
            da = abs(float(kp_cv["angle"][j]) - float(kps_or[i]["angle"]))
            ang_diffs.append(min(da, 2 * np.pi - da))
        assert matched >= 0.995 * min(len(kps_or), n_cv), matched
        bit_diffs = np.asarray(bit_diffs)
        # Descriptors: overwhelmingly bit-identical; near-tie cell-mean
        # comparisons may flip a few bits in a tiny fraction of keypoints.
        assert (bit_diffs == 0).mean() > 0.98, (
            (bit_diffs == 0).mean(),
            bit_diffs.sum() / (486.0 * max(matched, 1)),
        )
        assert np.mean(ang_diffs) < 1e-3
