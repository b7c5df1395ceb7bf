"""Tests for cv_tpu.ops.image against scipy/numpy oracles — the analog of the
reference's filter-vs-imageproc equivalence tests (akaze/src/image.rs:391-433).
"""

import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

from cv_tpu.ops import image as ops


class TestKernels:
    def test_gaussian_kernel_known_values(self):
        # Golden from the reference test (image.rs:395-412).
        kernel = ops.gaussian_kernel(3.0, 7)
        known = [
            0.10628852, 0.14032133, 0.16577007, 0.17524014,
            0.16577007, 0.14032133, 0.10628852,
        ]
        assert np.allclose(kernel, known, atol=1e-4)

    def test_scharr_kernels(self):
        assert np.allclose(ops.scharr_main_kernel(1), [-1, 0, 1])
        assert np.allclose(ops.scharr_off_kernel(1), [3, 10, 3])
        main3 = ops.scharr_main_kernel(3)
        assert main3.shape == (7,)
        assert main3[0] == -1 and main3[-1] == 1 and np.all(main3[1:-1] == 0)
        off3 = ops.scharr_off_kernel(3)
        norm = 1.0 / (2.0 * 3 * (10.0 / 3.0 + 2.0))
        assert np.isclose(off3[0], norm, atol=1e-7)
        assert np.isclose(off3[3], norm * 10.0 / 3.0, atol=1e-6)


class TestFilters:
    def test_horizontal_filter_matches_scipy(self, rng):
        img = rng.random((20, 33), dtype=np.float32)
        k = ops.gaussian_kernel(2.0, 9)
        ours = np.asarray(ops.horizontal_filter(jnp.asarray(img), k))
        ref = ndi.correlate1d(img, k, axis=1, mode="nearest")
        assert np.allclose(ours, ref, atol=1e-6)

    def test_vertical_filter_matches_scipy(self, rng):
        img = rng.random((20, 33), dtype=np.float32)
        k = ops.gaussian_kernel(2.0, 9)
        ours = np.asarray(ops.vertical_filter(jnp.asarray(img), k))
        ref = ndi.correlate1d(img, k, axis=0, mode="nearest")
        assert np.allclose(ours, ref, atol=1e-6)

    def test_batched_matches_single(self, rng):
        imgs = rng.random((3, 2, 16, 17), dtype=np.float32)
        k = ops.gaussian_kernel(1.0, 5)
        ours = np.asarray(ops.separable_filter(jnp.asarray(imgs), k, k))
        for i in range(3):
            for j in range(2):
                single = np.asarray(
                    ops.separable_filter(jnp.asarray(imgs[i, j]), k, k)
                )
                assert np.allclose(ours[i, j], single, atol=1e-7)

    def test_scharr_simple(self, rng):
        # Full Scharr = separable [-1,0,1] x [3,10,3]
        img = rng.random((12, 15), dtype=np.float32)
        ours = np.asarray(ops.scharr_horizontal(jnp.asarray(img), 1))
        kx = np.array([-1.0, 0.0, 1.0])
        ky = np.array([3.0, 10.0, 3.0])
        ref = ndi.correlate1d(
            ndi.correlate1d(img, kx, axis=1, mode="nearest"),
            ky, axis=0, mode="nearest",
        )
        assert np.allclose(ours, ref, atol=1e-5)


class TestHalfSize:
    def _reference_half(self, img):
        h, w = img.shape
        hh, hw = h // 2, w // 2
        out = np.zeros((hh, hw), dtype=img.dtype)
        for y in range(hh):
            for x in range(hw):
                out[y, x] = img[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].mean()
        if h % 2 == 1:
            for x in range(hw):
                out[-1, x] = 0.5 * (img[-1, 2 * x] + img[-1, 2 * x + 1])
        if w % 2 == 1:
            for y in range(hh):
                out[y, -1] = 0.5 * (img[2 * y, -1] + img[2 * y + 1, -1])
        if h % 2 == 1 and w % 2 == 1:
            out[-1, -1] = img[-1, -1]
        return out

    def test_even_odd_combos(self, rng):
        for h, w in [(8, 8), (9, 8), (8, 9), (9, 9), (47, 155)]:
            img = rng.random((h, w), dtype=np.float32)
            ours = np.asarray(ops.half_size(jnp.asarray(img)))
            ref = self._reference_half(img)
            assert ours.shape == ref.shape == (h // 2, w // 2)
            assert np.allclose(ours, ref, atol=1e-6), (h, w)


class TestDiffusion:
    def test_pm_g2(self, rng):
        lx = rng.normal(size=(5, 6)).astype(np.float32)
        ly = rng.normal(size=(5, 6)).astype(np.float32)
        k = 0.3
        ours = np.asarray(ops.pm_g2(jnp.asarray(lx), jnp.asarray(ly), k))
        ref = 1.0 / (1.0 + (lx**2 + ly**2) / k**2)
        assert np.allclose(ours, ref, atol=1e-5)

    def _reference_fed_step(self, lt, c, step):
        h, w = lt.shape
        hf = 0.5 * step * (c[:, :-1] + c[:, 1:]) * (lt[:, 1:] - lt[:, :-1])
        vf = 0.5 * step * (c[:-1, :] + c[1:, :]) * (lt[1:, :] - lt[:-1, :])
        out = lt.copy()
        out[:, :-1] += hf
        out[:, 1:] -= hf
        out[:-1, :] += vf
        out[1:, :] -= vf
        return out

    def test_fed_step_matches_reference_scatter(self, rng):
        lt = rng.random((7, 9), dtype=np.float32)
        c = rng.random((7, 9), dtype=np.float32)
        ours = np.asarray(ops.fed_step(jnp.asarray(lt), jnp.asarray(c), 0.25))
        ref = self._reference_fed_step(lt, c, np.float32(0.25))
        assert np.allclose(ours, ref, atol=1e-6)

    def test_fed_step_conserves_mass(self, rng):
        # Flows are antisymmetric, so the total intensity is conserved.
        lt = rng.random((16, 16), dtype=np.float64)
        c = rng.random((16, 16), dtype=np.float64)
        out = np.asarray(ops.fed_step(jnp.asarray(lt), jnp.asarray(c), 0.1))
        assert np.isclose(out.sum(), lt.sum(), atol=1e-9)
