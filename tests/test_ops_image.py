"""Image ops parity tests (cv2 as oracle where applicable)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from upsp_tpu.ops.image import (
    box_blur,
    convert_to_8u,
    first_min_threshold,
    fix_hot_pixels,
    gaussian_blur,
    intensity_histc,
    scale_image_max_inlier,
)


class TestFixHotPixels:
    def test_replaces_hot_pixel(self):
        img = np.full((8, 8), 1000, np.uint16)
        img[3, 4] = 4095
        out = np.array(fix_hot_pixels(jnp.asarray(img)))
        assert out[3, 4] == 1000
        assert (out == img).sum() == 63

    def test_small_excursion_kept(self):
        img = np.full((8, 8), 4000, np.uint16)
        img[3, 4] = 4095  # hot but change < min_change
        out = np.array(fix_hot_pixels(jnp.asarray(img)))
        assert out[3, 4] == 4095

    def test_too_many_hot(self):
        img = np.full((8, 8), 100, np.uint16)
        img.flat[:6] = 4095  # 6 > max_hot=5
        out = np.array(fix_hot_pixels(jnp.asarray(img)))
        np.testing.assert_array_equal(out, img)

    def test_edge_pixel(self):
        img = np.full((8, 8), 500, np.uint16)
        img[0, 0] = 4095
        out = np.array(fix_hot_pixels(jnp.asarray(img)))
        assert out[0, 0] == 500


class TestBlurs:
    def test_gaussian_vs_cv2(self, rng):
        img = rng.uniform(0, 4095, (64, 48)).astype(np.float32)
        for k in (3, 5, 7):
            ours = np.array(gaussian_blur(jnp.asarray(img), k))
            ref = cv2.GaussianBlur(img, (k, k), 0)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-2)

    def test_box_vs_cv2(self, rng):
        img = rng.uniform(0, 4095, (64, 48)).astype(np.float32)
        for k in (3, 5):
            ours = np.array(box_blur(jnp.asarray(img), k))
            ref = cv2.blur(img, (k, k), borderType=cv2.BORDER_REFLECT_101)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-2)


class TestScaling:
    def test_convert_to_8u(self):
        img = np.array([[0, 2048], [1024, 4095]], np.uint16)
        out = convert_to_8u(img)
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[1, 1] == 255

    def test_max_inlier_robust_to_outliers(self, rng):
        img = rng.uniform(0, 1000, (100, 100)).astype(np.uint16)
        img[0, 0] = 65535  # single saturated outlier must not set the scale
        out = scale_image_max_inlier(img)
        # most pixels should spread over the full 8-bit range
        assert out.max() == 255
        assert np.percentile(out, 99) > 200


class TestHistogramThreshold:
    def test_histc_counts(self):
        img = np.array([[0, 16, 16], [32, 4095, 5000]], np.uint16)
        edges, counts = intensity_histc(img, depth=12, bins=256)
        assert counts.sum() == 5  # 5000 >= 4096 excluded
        assert counts[0] == 1 and counts[1] == 2 and counts[2] == 1

    def test_first_min_threshold_bimodal(self):
        # clean bimodal histogram: dark peak at bin 2, valley at 5, peak at 8
        counts = np.array([1, 5, 30, 6, 3, 1, 4, 20, 40, 10, 2])
        idx = first_min_threshold(counts, 1)
        assert 4 <= idx <= 6
