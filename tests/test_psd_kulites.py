"""PSD parity vs scipy + kulite analysis helpers."""

import numpy as np
import pytest
from scipy import signal

import jax.numpy as jnp

from upsp_tpu.ops.psd import surface_psd, welch_psd
from upsp_tpu.processing.kulites import (
    compute_delta_rms,
    compute_psd,
    compute_rms_from_psd,
)


class TestWelch:
    @pytest.mark.parametrize("detrend", ["linear", "constant"])
    def test_matches_scipy(self, rng, detrend):
        fs = 10000.0
        t = np.arange(4096) / fs
        x = (
            0.8 * np.sin(2 * np.pi * 700 * t)
            + 0.3 * np.sin(2 * np.pi * 2100 * t)
            + rng.normal(0, 0.05, t.shape)
            + 0.002 * np.arange(len(t))  # trend to be removed
        ).astype(np.float32)
        f_ref, p_ref = signal.welch(
            x, fs=fs, window="hann", nperseg=1024, detrend=detrend
        )
        f_our, p_our = welch_psd(
            jnp.asarray(x)[None, :], fs, nperseg=1024, detrend=detrend
        )
        np.testing.assert_allclose(np.array(f_our), f_ref, rtol=1e-6)
        np.testing.assert_allclose(np.array(p_our[0]), p_ref, rtol=2e-3, atol=1e-9)

    def test_peak_detection(self, rng):
        fs = 5000.0
        t = np.arange(8192) / fs
        x = np.sin(2 * np.pi * 430 * t).astype(np.float32)
        f, p = welch_psd(jnp.asarray(x)[None, :], fs, nperseg=1024)
        peak = float(f[int(np.argmax(np.array(p[0])))])
        assert abs(peak - 430) < fs / 1024 * 1.5

    def test_batched_surface(self, rng):
        nodes, frames = 32, 2048
        x = rng.normal(size=(nodes, frames)).astype(np.float32)
        f, p = surface_psd(jnp.asarray(x), 10000.0, nperseg=512)
        assert p.shape == (nodes, 257)
        # white noise: flat-ish spectrum, total power ~ variance
        df = float(f[1] - f[0])
        total = np.array(p).sum(axis=1) * df
        np.testing.assert_allclose(total, x.var(axis=1), rtol=0.25)


class TestKuliteAnalysis:
    def test_delta_rms(self, rng):
        x = 3.0 + 0.5 * np.sin(np.linspace(0, 40 * np.pi, 4000))
        out = compute_delta_rms({"K01": x})
        assert out["K01"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-2)

    def test_psd_rms_consistency(self, rng):
        fs = 20000.0
        x = rng.normal(0, 0.3, 16384)
        psds = compute_psd({"K01": x}, fs, w_len=1024)
        rms2 = compute_rms_from_psd(psds)
        # integrated PSD (sum over bins) ~ variance / df
        df = psds["freq"][1] - psds["freq"][0]
        assert rms2["K01"] * df == pytest.approx(x.var(), rel=0.2)
