"""Pallas ECC kernels (ops/pallas_ecc.py) vs the jnp reference path.

Runs the kernels in interpreter mode on CPU (the production TPU lowering is
exercised by bench.py and the driver); parity targets:

- ``warp_affine_banded`` == ``warp_affine_mxu(order=2, band=8)`` (the exact
  banded oracle) for in-contract warps, and == dense order-2 up to matmul
  rounding.
- ``ecc_gn_moments`` + ``ecc_statistics_from_moments`` == the _ecc_core body
  statistics (Hessian, projections, norms, correlation) to f32 rounding.
- ``ecc_affine(impl="pallas")`` lands on the same optimum as ``impl="jnp"``
  (displacement-field comparison — affine parameters are individually
  degenerate, the induced displacement is the physical quantity; same
  convention as tests/test_registration.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upsp_tpu.ops.pallas_ecc import (
    ecc_gn_fused,
    ecc_gn_moments,
    ecc_statistics_from_moments,
    warp_affine_banded,
)
from upsp_tpu.ops.registration import ecc_affine
from upsp_tpu.ops.warp import warp_affine_mxu, warp_validity_mask


def make_test_image(rng, h=96, w=128):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w), np.float32)
    for _ in range(12):
        cx, cy = rng.uniform(10, w - 10), rng.uniform(10, h - 10)
        s = rng.uniform(3, 12)
        a = rng.uniform(500, 2000)
        img += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    img += 800
    return img.astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestBandedWarp:
    def test_matches_banded_oracle(self, rng):
        img = jnp.asarray(rng.normal(2000, 300, (96, 128)).astype(np.float32))
        warp = jnp.asarray(
            np.array([[1.0004, -2e-4, 0.37], [3e-4, 0.9996, -1.2]], np.float32)
        )
        ref = np.asarray(warp_affine_mxu(img, warp, order=2, band=8))
        out = np.asarray(warp_affine_banded(img, warp))
        assert np.abs(out - ref).max() < 2e-2  # f32 rounding on ~4000 counts

    def test_identity_exact(self, rng):
        img = jnp.asarray(rng.normal(2000, 300, (64, 128)).astype(np.float32))
        from upsp_tpu.ops.registration import identity_warp

        out = np.asarray(warp_affine_banded(img, identity_warp()))
        np.testing.assert_allclose(out, np.asarray(img), rtol=0, atol=1e-4)

    def test_border_constant_zero(self, rng):
        img = jnp.asarray(rng.normal(2000, 300, (64, 96)).astype(np.float32) + 500)
        warp = jnp.asarray(np.array([[1.0, 0.0, 2.0], [0.0, 1.0, -3.0]], np.float32))
        out = np.asarray(warp_affine_banded(img, warp))
        dense = np.asarray(warp_affine_mxu(img, warp, order=2))
        np.testing.assert_allclose(out, dense, rtol=1e-5, atol=2e-2)
        assert np.all(out[:3, :] == 0.0)  # ty=-3 walks off the top
        assert np.all(out[:, -2:] == 0.0)  # tx=+2 walks off the right

    def test_vmap_batches(self, rng):
        imgs = jnp.asarray(rng.normal(2000, 300, (3, 64, 128)).astype(np.float32))
        warps = jnp.stack(
            [
                jnp.asarray(
                    np.array(
                        [[1.0 + 3e-4 * i, 1e-4, 0.2 * i], [-1e-4, 1.0, -0.1 * i]],
                        np.float32,
                    )
                )
                for i in range(3)
            ]
        )
        outs = np.asarray(jax.vmap(warp_affine_banded)(imgs, warps))
        for i in range(3):
            ref = np.asarray(warp_affine_mxu(imgs[i], warps[i], order=2, band=8))
            assert np.abs(outs[i] - ref).max() < 2e-2

    def test_bf16_images(self, rng):
        img32 = jnp.asarray(rng.normal(2000, 300, (64, 128)).astype(np.float32))
        warp = jnp.asarray(np.array([[1.0, 0.0, 0.4], [0.0, 1.0, -0.6]], np.float32))
        out16 = np.asarray(
            warp_affine_banded(img32.astype(jnp.bfloat16), warp)
        ).astype(np.float32)
        ref = np.asarray(warp_affine_mxu(img32, warp, order=2, band=8))
        # bf16 storage rounding only (~8 counts at 4000 full scale)
        assert np.abs(out16 - ref).max() < 16.0


class TestMomentsKernel:
    def _jnp_stats(self, iw, tmpl, warp, H, W):
        ys, xs = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32),
            jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        gix = jnp.zeros_like(iw).at[:, 1:-1].set(0.5 * (iw[:, 2:] - iw[:, :-2]))
        giy = jnp.zeros_like(iw).at[1:-1, :].set(0.5 * (iw[2:, :] - iw[:-2, :]))
        a00, a01 = warp[0, 0], warp[0, 1]
        a10, a11 = warp[1, 0], warp[1, 1]
        det = a00 * a11 - a01 * a10
        gx = (a11 * gix - a10 * giy) / det
        gy = (-a01 * gix + a00 * giy) / det
        m = warp_validity_mask((H, W), warp)
        area = jnp.maximum(jnp.sum(m), 1.0)
        gx, gy = gx * m, gy * m
        t_mean = jnp.sum(tmpl * m) / area
        t_zm = (tmpl - t_mean) * m
        i_mean = jnp.sum(iw * m) / area
        i_zm = (iw - i_mean) * m

        def proj(z):
            return jnp.array(
                [
                    jnp.sum(gx * xs * z), jnp.sum(gy * xs * z),
                    jnp.sum(gx * ys * z), jnp.sum(gy * ys * z),
                    jnp.sum(gx * z), jnp.sum(gy * z),
                ],
                jnp.float32,
            )

        return (
            proj(i_zm), proj(t_zm),
            jnp.sum(i_zm * i_zm), jnp.sum(t_zm * i_zm),
            jnp.sum(gx * gx * xs * xs), area,
        )

    def test_matches_jnp_statistics(self, rng):
        H, W = 96, 128
        tmpl = jnp.asarray(make_test_image(rng, H, W))
        warp = jnp.asarray(
            np.array([[1.0003, -1e-4, 0.5], [2e-4, 0.9997, -0.8]], np.float32)
        )
        iw = warp_affine_mxu(jnp.asarray(make_test_image(rng, H, W)), warp)
        mom = ecc_gn_moments(iw, tmpl, warp, warp)
        Hm, pi_p, pt_p, n2_p, c_p, tn_p, area_p = ecc_statistics_from_moments(mom)
        pi_j, pt_j, n2_j, c_j, hxx_j, area_j = self._jnp_stats(iw, tmpl, warp, H, W)
        np.testing.assert_allclose(np.asarray(pi_p), np.asarray(pi_j), rtol=2e-3)
        np.testing.assert_allclose(np.asarray(pt_p), np.asarray(pt_j), rtol=2e-3)
        assert float(n2_p) == pytest.approx(float(n2_j), rel=1e-3)
        assert float(c_p) == pytest.approx(float(c_j), rel=1e-3)
        assert float(Hm[0, 0]) == pytest.approx(float(hxx_j), rel=1e-4)
        assert float(area_p) == float(area_j)

    def test_mask_warp_composition(self, rng):
        """valid_shift-composed mask warp shrinks the area like the jnp mask."""
        H, W = 64, 96
        tmpl = jnp.asarray(make_test_image(rng, H, W))
        iw = jnp.asarray(make_test_image(rng, H, W))
        warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
        shifted = jnp.asarray(
            np.array([[1.0, 0.0, 4.0], [0.0, 1.0, -6.0]], np.float32)
        )
        area_full = float(ecc_statistics_from_moments(
            ecc_gn_moments(iw, tmpl, warp, warp))[-1])
        area_shift = float(ecc_statistics_from_moments(
            ecc_gn_moments(iw, tmpl, warp, shifted))[-1])
        assert area_full == H * W
        assert area_shift == (H - 6) * (W - 4)


class TestFusedGNStep:
    """ecc_gn_fused == warp_affine_banded -> ecc_gn_moments (split kernels)."""

    def test_matches_split_kernels(self, rng):
        H, W = 96, 128
        tmpl = jnp.asarray(make_test_image(rng, H, W))
        img = jnp.asarray(make_test_image(rng, H, W))
        warp = jnp.asarray(
            np.array([[1.0004, -2e-4, 0.4], [3e-4, 0.9996, -0.9]], np.float32)
        )
        mom_split = ecc_gn_moments(
            warp_affine_banded(img, warp), tmpl, warp, warp
        )
        mom_fused = ecc_gn_fused(img, tmpl, warp, warp)
        s, f = np.asarray(mom_split[:42]), np.asarray(mom_fused[:42])
        # identical math on identical f32 values, modulo reduction-order-free
        # paths: the warped image is bitwise-equal (same per-row formulas),
        # so statistics agree to f32 reduction noise
        np.testing.assert_allclose(f, s, rtol=1e-5, atol=1e-3)

    def test_mask_warp_composition(self, rng):
        H, W = 64, 96
        tmpl = jnp.asarray(make_test_image(rng, H, W))
        img = jnp.asarray(make_test_image(rng, H, W))
        warp = jnp.asarray(np.eye(2, 3, dtype=np.float32))
        shifted = jnp.asarray(
            np.array([[1.0, 0.0, 4.0], [0.0, 1.0, -6.0]], np.float32)
        )
        area = float(ecc_statistics_from_moments(
            ecc_gn_fused(img, tmpl, warp, shifted))[-1])
        assert area == (H - 6) * (W - 4)

    def test_vmap_batches(self, rng):
        H, W = 64, 128
        tmpl = jnp.asarray(make_test_image(rng, H, W))
        imgs = jnp.stack([jnp.asarray(make_test_image(rng, H, W))
                          for _ in range(3)])
        warps = jnp.stack([
            jnp.asarray(np.array(
                [[1.0 + 2e-4 * i, 1e-4, 0.3 * i], [-1e-4, 1.0, -0.2 * i]],
                np.float32,
            ))
            for i in range(3)
        ])
        fused = np.asarray(
            jax.vmap(lambda im, w: ecc_gn_fused(im, tmpl, w, w))(imgs, warps)
        )
        for i in range(3):
            one = np.asarray(ecc_gn_fused(imgs[i], tmpl, warps[i], warps[i]))
            np.testing.assert_allclose(fused[i, :42], one[:42],
                                       rtol=1e-5, atol=1e-3)


class TestEccPallasImpl:
    def _disp_diff(self, w1, w2, h, w):
        ys, xs = np.mgrid[8 : h - 8, 8 : w - 8]
        pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)], axis=0)
        return np.abs((np.asarray(w1) - np.asarray(w2)) @ pts).max()

    def test_same_optimum_as_jnp(self, rng):
        big = make_test_image(rng, h=192, w=256)
        true = np.array([[1.0004, 2e-4, 0.6], [-3e-4, 0.9996, -1.1]], np.float32)
        inp_big = np.asarray(warp_affine_mxu(jnp.asarray(big), jnp.asarray(true)))
        crop = (slice(32, 160), slice(32, 224))
        ref = jnp.asarray(np.ascontiguousarray(big[crop]))
        inp = jnp.asarray(np.ascontiguousarray(inp_big[crop]))
        H, W = ref.shape
        w_j, r_j, _ = ecc_affine(
            ref, inp, max_iters=3, unroll=True, return_iters=True, impl="jnp"
        )
        w_p, r_p, _ = ecc_affine(
            ref, inp, max_iters=3, unroll=True, return_iters=True, impl="pallas"
        )
        assert self._disp_diff(w_j, w_p, H, W) < 0.02
        assert float(r_j) > 0.999 and float(r_p) > 0.999
        assert float(r_j) == pytest.approx(float(r_p), abs=1e-4)

    def test_band_conflict_raises(self, rng):
        img = jnp.asarray(make_test_image(rng))
        with pytest.raises(ValueError, match="band"):
            ecc_affine(img, img, max_iters=1, unroll=True, impl="pallas", band=8)


class TestBf16Kernels:
    """bf16 images through the round-4 kernels: storage rounding only
    (compute stays f32 in-kernel), matching the compute_dtype=bfloat16
    pipeline contract the bench measures."""

    def test_warp_filter_bf16(self, rng):
        from upsp_tpu.ops.image import gaussian_blur
        from upsp_tpu.ops.pallas_ecc import (
            filter_taps,
            make_warp_filter,
            warp_affine_banded,
        )

        img32 = jnp.asarray(rng.normal(2000, 300, (64, 128)).astype(np.float32))
        warp = jnp.asarray(
            np.array([[1.0002, -1e-4, 0.3], [1e-4, 0.9998, -0.5]], np.float32)
        )
        out16 = make_warp_filter(filter_taps("gaussian", 3))(
            img32.astype(jnp.bfloat16), warp
        )
        assert out16.dtype == jnp.bfloat16
        ref = np.asarray(gaussian_blur(warp_affine_banded(img32, warp), 3))
        # bf16 storage rounding ~8 counts at 4000 full scale
        assert np.abs(np.asarray(out16, np.float32) - ref).max() < 16.0

    def test_blur_bf16(self, rng):
        from upsp_tpu.ops.image import gaussian_blur, gaussian_kernel_1d
        from upsp_tpu.ops.pallas_ecc import make_blur

        img32 = jnp.asarray(rng.normal(2000, 300, (64, 128)).astype(np.float32))
        out16 = make_blur(tuple(float(t) for t in gaussian_kernel_1d(5)))(
            img32.astype(jnp.bfloat16)
        )
        assert out16.dtype == jnp.bfloat16
        ref = np.asarray(gaussian_blur(img32, 5))
        assert np.abs(np.asarray(out16, np.float32) - ref).max() < 16.0


class TestOddWidth:
    """Kernels at a non-128-multiple lane width (the 2 MP full config is
    1200x1800): masks/rolls must respect the true width, not the padded."""

    def test_warp_filter_odd_width(self, rng):
        from upsp_tpu.ops.image import gaussian_blur
        from upsp_tpu.ops.pallas_ecc import (
            filter_taps,
            make_warp_filter,
            warp_affine_banded,
        )

        img = jnp.asarray(rng.normal(2000, 300, (96, 200)).astype(np.float32))
        warp = jnp.asarray(
            np.array([[1.0003, -1e-4, 0.6], [2e-4, 0.9997, -0.8]], np.float32)
        )
        out = np.asarray(make_warp_filter(filter_taps("gaussian", 3))(img, warp))
        ref = np.asarray(gaussian_blur(warp_affine_banded(img, warp), 3))
        assert np.abs(out - ref).max() < 1e-3

    def test_moments_odd_width(self, rng):
        tmpl = jnp.asarray(make_test_image(rng, 96, 200))
        img = jnp.asarray(make_test_image(rng, 96, 200))
        warp = jnp.asarray(
            np.array([[1.0, 0.0, 0.4], [0.0, 1.0, -0.3]], np.float32)
        )
        mom = ecc_gn_moments(warp_affine_banded(img, warp), tmpl, warp, warp)
        area = float(ecc_statistics_from_moments(mom)[-1])
        assert area == pytest.approx(95 * 199, rel=0.02)


class TestHotPixelKernel:
    """fix_hot_pixels_pallas == ops.image.fix_hot_pixels exactly."""

    def _check(self, img):
        from upsp_tpu.ops.image import fix_hot_pixels
        from upsp_tpu.ops.pallas_ecc import fix_hot_pixels_pallas

        out = np.asarray(fix_hot_pixels_pallas(jnp.asarray(img)))
        ref = np.asarray(fix_hot_pixels(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_repairs_hot_pixels(self, rng):
        img = rng.normal(2000, 200, (64, 128)).astype(np.float32)
        for y, x in [(0, 0), (5, 127), (63, 64), (31, 31)]:
            img[y, x] = 4090.0  # hot, incl. corner/edge median cases
        self._check(img)

    def test_bails_above_max_hot(self, rng):
        img = rng.normal(2000, 200, (64, 128)).astype(np.float32)
        ys, xs = rng.integers(2, 60, 8), rng.integers(2, 120, 8)
        img[ys, xs] = 4095.0  # 8 > max_hot=5: frame returned unchanged
        self._check(img)

    def test_uint16(self, rng):
        img = rng.integers(100, 3000, (64, 128)).astype(np.uint16)
        img[10, 10] = 4095
        self._check(img)

    def test_vmap(self, rng):
        from upsp_tpu.ops.image import fix_hot_pixels
        from upsp_tpu.ops.pallas_ecc import fix_hot_pixels_pallas

        imgs = rng.normal(2000, 200, (3, 64, 128)).astype(np.float32)
        imgs[1, 8, 9] = 4090.0
        outs = np.asarray(jax.vmap(fix_hot_pixels_pallas)(jnp.asarray(imgs)))
        for i in range(3):
            np.testing.assert_array_equal(
                outs[i], np.asarray(fix_hot_pixels(jnp.asarray(imgs[i])))
            )


class TestBlurKernel:
    """make_blur == ops.image.gaussian_blur (reflect-101) to f32 rounding."""

    def test_matches_gaussian_blur(self, rng):
        from upsp_tpu.ops.image import gaussian_blur, gaussian_kernel_1d
        from upsp_tpu.ops.pallas_ecc import make_blur

        img = jnp.asarray(rng.normal(2000, 300, (96, 128)).astype(np.float32))
        for ks in (3, 5):
            taps = tuple(float(t) for t in gaussian_kernel_1d(ks))
            out = np.asarray(make_blur(taps)(img))
            ref = np.asarray(gaussian_blur(img, ks))
            assert np.abs(out - ref).max() < 1e-3

    def test_unbatched_under_vmap(self, rng):
        """An unbatched template under a frame vmap is blurred once."""
        from upsp_tpu.ops.image import gaussian_blur, gaussian_kernel_1d
        from upsp_tpu.ops.pallas_ecc import make_blur

        tmpl = jnp.asarray(rng.normal(2000, 300, (64, 128)).astype(np.float32))
        frames = jnp.zeros((3, 64, 128), jnp.float32)
        blur = make_blur(tuple(float(t) for t in gaussian_kernel_1d(5)))
        outs = np.asarray(jax.vmap(lambda f: blur(tmpl) + 0.0 * f)(frames))
        ref = np.asarray(gaussian_blur(tmpl, 5))
        for i in range(3):
            assert np.abs(outs[i] - ref).max() < 1e-3


class TestPatchNodeCorrection:
    """filter(patch(warped)) precomposed to affected-pixel values
    (ops/patching.py build_patch_node_correction): exact against the
    sequential apply_patches -> blur path at an identity warp (both sides
    then see identical pixel values, so tolerance is f32 rounding only)."""

    def _setup(self, rng, H=96, W=128):
        from upsp_tpu.ops.patching import (
            build_patch_clusters,
            build_patch_operator,
        )

        dots = rng.uniform(20, 70, size=(5, 2))
        diam = rng.uniform(4.0, 7.0, 5)
        clusters = build_patch_clusters(dots, diam, (H, W), 3, 2)
        op = build_patch_operator(clusters, (H, W))
        img = jnp.asarray(make_test_image(rng, H, W))
        return op, img

    @pytest.mark.parametrize("ft,ks", [("gaussian", 3), ("box", 5), ("none", 1)])
    def test_matches_sequential(self, rng, ft, ks):
        from upsp_tpu.ops.image import box_blur, gaussian_blur
        from upsp_tpu.ops.patching import (
            apply_patches,
            build_patch_node_correction,
            patch_correction_values,
        )

        H, W = 96, 128
        op, img = self._setup(rng, H, W)
        corr = build_patch_node_correction(op, (H, W), ft, ks)
        assert corr is not None
        patched = apply_patches(img, op)
        seq = {
            "gaussian": lambda: gaussian_blur(patched, ks),
            "box": lambda: box_blur(patched, ks),
            "none": lambda: patched,
        }[ft]()
        vals = np.asarray(patch_correction_values(img, corr))
        pix = np.asarray(corr.pix_idx)
        seq_flat = np.asarray(seq).ravel()
        for k in range(corr.n_clusters):
            for a in range(pix.shape[1]):
                if pix[k, a] == H * W:
                    continue
                assert abs(vals[k, a] - seq_flat[pix[k, a]]) < 0.05, (
                    k, a, vals[k, a], seq_flat[pix[k, a]]
                )

    def test_unsupported_filter_falls_back(self, rng):
        from upsp_tpu.ops.patching import build_patch_node_correction

        op, _ = self._setup(rng)
        assert build_patch_node_correction(op, (96, 128), "gaussian", 9) is None
        assert build_patch_node_correction(op, (96, 128), "median", 3) is None


class TestPreShiftPipeline:
    """fft-mode integer pre-shift (phase1.make_chunk_processor)."""

    def _setup(self, tmp_path, shift_scale=0.8, F=8):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_driver_mesh import _config, _frames

        from upsp_tpu.pipeline.phase0 import run_phase0

        rng = np.random.default_rng(3)
        shifts = np.cumsum(rng.normal(0, shift_scale, size=(F, 2)), axis=0)
        shifts[0] = 0
        frames = _frames(F, shifts=shifts)
        cfg = _config(tmp_path, registration="pixel")
        state = run_phase0(cfg, [frames[0, 0]], [12])
        return state, frames

    def test_pre_shift_matches_plain_fft(self, tmp_path):
        """Pre-shifted solve == full-warp solve (same optimum, same borders
        up to the sub-pixel boundary blend) — multi-pixel shifts included."""
        from upsp_tpu.pipeline.phase1 import make_chunk_processor

        state, frames = self._setup(tmp_path)
        plain = make_chunk_processor(
            state, warm_start="fft", ecc_iters=3, pre_shift=False
        )
        pre = make_chunk_processor(
            state, warm_start="fft", ecc_iters=3, pre_shift=True
        )
        i1 = np.asarray(plain(jnp.asarray(frames)))
        i2 = np.asarray(pre(jnp.asarray(frames)))
        v = np.isfinite(i1)
        assert np.isfinite(i2).sum() >= v.sum() - frames.shape[0]
        both = v & np.isfinite(i2)
        np.testing.assert_allclose(i2[both], i1[both], rtol=1e-4, atol=0.2)

    def test_pallas_impl_end_to_end(self, tmp_path):
        """ecc_impl='pallas' + pre-shift == jnp path through the full fused
        frame program (interpret mode on CPU)."""
        from upsp_tpu.pipeline.phase1 import make_chunk_processor

        state, frames = self._setup(tmp_path, shift_scale=0.2, F=4)
        jn = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, pre_shift=True,
            ecc_impl="jnp", with_telemetry=True,
        )
        pa = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, pre_shift=True,
            ecc_impl="pallas", with_telemetry=True,
        )
        i1, t1 = jn(jnp.asarray(frames))
        i2, t2 = pa(jnp.asarray(frames))
        i1, i2 = np.asarray(i1), np.asarray(i2)
        v1 = np.isfinite(i1)  # NaN = skipped (invisible) nodes
        both = v1 & np.isfinite(i2)
        assert both.sum() >= v1.sum() - i1.shape[0]  # same coverage
        np.testing.assert_allclose(i2[both], i1[both], rtol=1e-4, atol=0.2)
        # telemetry: rho agrees; translation columns carry the TOTAL shift
        # (column 4 is the banded-path displacement certificate — 0 on the
        # jnp path by definition, so compare translations only)
        t1, t2 = np.asarray(t1), np.asarray(t2)
        np.testing.assert_allclose(t2[:, :, 0], t1[:, :, 0], atol=1e-3)
        np.testing.assert_allclose(t2[:, :, 2:4], t1[:, :, 2:4], atol=0.05)
        assert (t1[:, :, 4] == 0).all()  # dense path: no banded contract
        # pallas path: certificate present and within the band (pre-shifted
        # residuals are sub-pixel + affine edge terms)
        from upsp_tpu.ops.pallas_ecc import DEFAULT_BAND

        assert (t2[:, :, 4] <= DEFAULT_BAND).all()

    def test_telemetry_total_translation(self, tmp_path):
        """Pre-shift mode telemetry reports the composed (total) shift.

        Analytic multi-pixel shifts (no wrap artifacts): the phase
        correlator captures the integer part, so t_int is genuinely nonzero
        and the composed record must match the plain (no-pre-shift) path's
        total translation.
        """
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_driver_mesh import _config, _frames

        from upsp_tpu.pipeline.phase0 import run_phase0
        from upsp_tpu.pipeline.phase1 import make_chunk_processor

        shifts = [(0.0, 0.0), (2.3, -1.6), (-1.8, 2.2), (3.1, 0.4)]
        frames = _frames(4, shifts=shifts)
        cfg = _config(tmp_path, registration="pixel")
        state = run_phase0(cfg, [frames[0, 0]], [12])
        plain = make_chunk_processor(
            state, warm_start="fft", ecc_iters=3, pre_shift=False,
            with_telemetry=True,
        )
        pre = make_chunk_processor(
            state, warm_start="fft", ecc_iters=3, pre_shift=True,
            with_telemetry=True,
        )
        _, t1 = plain(jnp.asarray(frames))
        _, t2 = pre(jnp.asarray(frames))
        t1, t2 = np.asarray(t1), np.asarray(t2)
        assert np.abs(t2[:, :, 2:]).max() > 1.5  # total, not residual
        np.testing.assert_allclose(t2[:, :, 2:], t1[:, :, 2:], atol=0.1)
        np.testing.assert_allclose(t2[:, :, 0], t1[:, :, 0], atol=1e-3)


class TestDisplacementCertificate:
    """Banded-warp displacement certificate + driver hard guard.

    VERDICT round-4 weak #1: a frame whose displacement exceeds the band
    must not silently zero-sample.  Column 4 of phase-1 telemetry carries
    the on-device worst-case displacement bound of the residual warp
    (ops/pallas_ecc.warp_displacement_bound); the driver re-runs violating
    frames on the dense path (pipeline/run._BandGuard).
    """

    def test_bound_analytic(self):
        from upsp_tpu.ops.pallas_ecc import warp_displacement_bound

        h, w = 96, 128
        # pure translation: bound is the largest |component|
        wtx = jnp.array([[1.0, 0.0, 2.5], [0.0, 1.0, -1.25]])
        assert float(warp_displacement_bound(wtx, h, w)) == pytest.approx(2.5)
        # pure scale about the origin: bound attained at the far corner
        s = 1.02
        wsc = jnp.array([[s, 0.0, 0.0], [0.0, s, 0.0]])
        assert float(warp_displacement_bound(wsc, h, w)) == pytest.approx(
            (s - 1.0) * (w - 1), rel=1e-5
        )
        # identity: zero
        wid = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        assert float(warp_displacement_bound(wid, h, w)) == 0.0

    def _setup(self, tmp_path):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_driver_mesh import _config, _frames

        from upsp_tpu.pipeline.phase0 import run_phase0

        # frame 2 shifted far beyond the band: with pre-shift disabled the
        # banded kernels sample ZERO everywhere (every pixel displaced by
        # ~2x band), the exact silent-degradation scenario the guard closes
        from upsp_tpu.ops.pallas_ecc import DEFAULT_BAND

        big = DEFAULT_BAND * 2 + 0.3
        shifts = [(0.0, 0.0), (0.4, -0.3), (big, 0.0), (-0.2, 0.5)]
        frames = _frames(4, shifts=shifts)
        cfg = _config(tmp_path, registration="pixel")
        state = run_phase0(cfg, [frames[0, 0]], [12])
        return state, frames, big

    def test_guard_reprocesses_out_of_band_frames(self, tmp_path):
        from upsp_tpu.ops.pallas_ecc import DEFAULT_BAND
        from upsp_tpu.pipeline.phase1 import make_chunk_processor
        from upsp_tpu.pipeline.run import _BandGuard

        state, frames, big = self._setup(tmp_path)
        banded = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, pre_shift=False,
            ecc_impl="pallas", with_telemetry=True,
        )
        sol, tele = banded(jnp.asarray(frames))
        sol, tele = np.array(sol), np.array(tele)
        # the certificate flags exactly the out-of-band frame
        guard = _BandGuard(state, "fft", False, {}, "float32")
        bad = guard.flagged(tele)
        assert 2 in bad.tolist()
        assert tele[2, 0, 4] > DEFAULT_BAND
        assert 1 not in bad.tolist()
        # dense oracle: the displacement-unlimited reference-parity path
        dense = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, ecc_impl="jnp",
            with_telemetry=True,
        )
        oracle = np.asarray(dense(jnp.asarray(frames))[0])
        fin = np.isfinite(oracle[2])
        # before the guard: the flagged frame IS silently degraded (banded
        # zero-sampling) — this is the failure mode under test
        assert not np.allclose(sol[2][fin], oracle[2][fin], atol=0.5)
        guard.reprocess(sol, tele, frames, bad, 0)
        np.testing.assert_allclose(
            sol[2][fin], oracle[2][fin], rtol=1e-4, atol=0.2
        )
        # telemetry of the reprocessed frame now reports the dense path
        assert tele[2, 0, 4] == 0.0
        assert guard.reprocessed == len(bad)

    def test_in_band_frames_not_flagged(self, tmp_path):
        """Sub-band shifts pass the certificate untouched (no reprocess)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_driver_mesh import _config, _frames

        from upsp_tpu.pipeline.phase0 import run_phase0
        from upsp_tpu.pipeline.phase1 import make_chunk_processor
        from upsp_tpu.pipeline.run import _BandGuard

        shifts = [(0.0, 0.0), (0.6, -0.4), (-0.5, 0.2), (0.3, 0.7)]
        frames = _frames(4, shifts=shifts)
        cfg = _config(tmp_path, registration="pixel")
        state = run_phase0(cfg, [frames[0, 0]], [12])
        fn = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, pre_shift=True,
            ecc_impl="pallas", with_telemetry=True,
        )
        _, tele = fn(jnp.asarray(frames))
        guard = _BandGuard(state, "fft", False, {}, "float32")
        assert guard.flagged(np.asarray(tele)).size == 0
