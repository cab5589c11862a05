"""PSD parity vs scipy + kulite analysis helpers."""

import os
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


class TestKuliteSelection:
    def test_selection_area_center_directions(self):
        from upsp_tpu.processing.kulite_selection import selection_area_center

        p0 = np.array([2.0, 3.0, 4.0])
        d = 0.5
        up = selection_area_center(p0, "up", d)
        np.testing.assert_allclose(up, [1.5, 3.0, 4.0])
        down = selection_area_center(p0, "down", d)
        np.testing.assert_allclose(down, [2.5, 3.0, 4.0])
        for side in ("port", "starboard"):
            q = selection_area_center(p0, side, d)
            # stays on the same circumference, same station
            assert q[0] == p0[0]
            np.testing.assert_allclose(np.hypot(q[1], q[2]), 5.0, rtol=1e-12)
            # arc length ~= displacement for small angles
            ang = np.arccos(np.dot(q[1:], p0[1:]) / 25.0)
            np.testing.assert_allclose(ang * 5.0, d, rtol=1e-6)
        # opposite sides
        port = selection_area_center(p0, "port", d)
        star = selection_area_center(p0, "starboard", d)
        assert not np.allclose(port, star)
        with pytest.raises(ValueError):
            selection_area_center(p0, "sideways", d)

    def _plate_model(self):
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        return from_struct_grid(make_plate_grid(41, 33))

    def test_neighborhood_search(self):
        from upsp_tpu.processing.kulite_selection import KuliteNeighborhoodSearch

        model = self._plate_model()
        kul = {"K01": np.array([5.0, 4.0, 0.0])}
        search = KuliteNeighborhoodSearch(model, kul)
        res = search.query("K01", "up", 1.0, number_vertices=12)
        sel = res["Selection Vertices"]
        assert len(sel) == 12
        assert len(set(sel)) == 12
        # nearest vertex is at the kulite, selection is displaced forward (-X)
        nn = model.vertices[res["Kulite Nearest Vertex"]]
        np.testing.assert_allclose(nn[:2], [5.0, 4.0], atol=0.2)
        centroid = model.vertices[sel].mean(axis=0)
        assert centroid[0] < 4.5  # shifted toward -X by ~1
        np.testing.assert_allclose(centroid[1], 4.0, atol=0.3)

    def test_filter_duplicates(self):
        from upsp_tpu.geometry.grids import SurfaceModel
        from upsp_tpu.processing.kulite_selection import KuliteNeighborhoodSearch

        # two clusters of coincident points + one loner
        verts = np.array(
            [[0, 0, 0], [0.001, 0, 0], [1, 0, 0], [1.0005, 0, 0], [3, 0, 0]],
            np.float32,
        )
        n = len(verts)
        model = SurfaceModel(
            vertices=verts,
            triangles=np.zeros((0, 3), np.int32),
            normals=np.tile([0, 0, 1.0], (n, 1)).astype(np.float32),
            components=np.zeros(n, np.int32),
            is_datanode=np.ones(n, bool),
            superseded_by=np.arange(n, dtype=np.int32),
        )
        search = KuliteNeighborhoodSearch(model, {})
        kept = search.filter_duplicates([0, 1, 2, 3, 4], duplicate_vertex_tol=0.01)
        assert kept == [0, 2, 4]

    def test_selection_area_images(self, tmp_path):
        pytest.importorskip("cv2")
        from upsp_tpu.pipeline.diagnostics import write_phase0_diagnostics
        from upsp_tpu.pipeline.synthetic import make_synthetic_state
        from upsp_tpu.processing.kulite_selection import (
            KuliteNeighborhoodSearch,
            make_selection_area_images,
        )

        state = make_synthetic_state(
            n_cameras=1, image_hw=(64, 96), grid_shape=(24, 20),
            n_patch_dots=3, registration="none",
        )
        diag = tmp_path / "diag"
        write_phase0_diagnostics(state, str(diag))
        kul = {"K01": state.model.vertices[150]}
        search = KuliteNeighborhoodSearch(state.model, kul)
        res = search.query("K01", "up", 0.5, number_vertices=8)
        recs = [
            {
                "Kulite Name": "K01",
                "Kulite Nearest Vertex": res["Kulite Nearest Vertex"],
                # string repr as stored in the comparison CSVs
                "Selection Vertices": str(res["Selection Vertices"]),
            }
        ]
        out = make_selection_area_images(recs, str(diag), str(tmp_path / "imgs"))
        assert len(out) == 1
        import cv2

        img = cv2.imread(out[0])
        base = cv2.imread(str(diag / "cam01-8bit-raw.png"))
        assert img.shape[:2] == base.shape[:2]
        # some pixels changed to the highlight color
        assert (img != cv2.cvtColor(
            cv2.cvtColor(base, cv2.COLOR_BGR2GRAY), cv2.COLOR_GRAY2BGR
        )).any()


class TestKuliteComparisonCLI:
    def test_displaced_selection_and_images(self, tmp_path):
        """upsp-kulite-comparison --direction up writes CSV + debug images."""
        pytest.importorskip("cv2")
        import os
        import subprocess
        import sys

        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.diagnostics import write_phase0_diagnostics
        from upsp_tpu.pipeline.synthetic import make_synthetic_state

        state = make_synthetic_state(
            n_cameras=1, image_hw=(64, 96), grid_shape=(24, 20),
            n_patch_dots=3, registration="none",
        )
        # grid file for load_model (plate grid matches the synthetic state)
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        write_p3d_grid(str(tmp_path / "plate.grid"), make_plate_grid(24, 20))
        # one kulite at a mid-plate vertex
        v = state.model.vertices[150]
        tgts = tmp_path / "model.tgts"
        tgts.write_text(
            "*Targets\n"
            f"1 {v[0]:.4f} {v[1]:.4f} {v[2]:.4f} 0.0 0.0 1.0 0.1 1 1 1 K01\n"
        )
        # pressure_transpose: (N, F) flat file
        N, F = state.model.size, 16
        press = np.random.default_rng(3).normal(
            0, 0.01, size=(N, F)
        ).astype("<f4")
        press.tofile(tmp_path / "pressure_transpose")
        diag = tmp_path / "diag"
        write_phase0_diagnostics(state, str(diag))

        r = subprocess.run(
            [
                sys.executable, "scripts/upsp-kulite-comparison",
                "--pressure", str(tmp_path / "pressure_transpose"),
                "--grid", str(tmp_path / "plate.grid"),
                "--tgts", str(tgts),
                "--frames", str(F),
                "--direction", "up", "--distance", "0.5", "--n-vertices", "6",
                "--diag-dir", str(diag),
                "--images-out", str(tmp_path / "imgs"),
                "--out", str(tmp_path / "cmp.csv"),
            ],
            capture_output=True, text=True, cwd="/root/repo",
            env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo"),
        )
        assert r.returncode == 0, r.stderr
        import csv as _csv

        with open(tmp_path / "cmp.csv") as fh:
            rows = list(_csv.DictReader(fh))
        assert rows[0]["kulite"] == "K01"
        assert len(rows[0]["selection_vertices"].split()) == 6
        assert float(rows[0]["upsp_rms_dcp"]) > 0
        assert (tmp_path / "imgs" / "cam01-selected-pixels.png").exists()


class TestKuliteInfoFiles:
    """Synthesized .info/.fast/.slow fixtures regression-lock the DAQ readers
    (no real DAQ files in test data; format per kulite_utilities.py:150-340
    semantics — tab-separated blocks with 2 leading index columns)."""

    def _write_fixture(self, d, with_user_name=True, run=123, seq=4):
        name = f"wtT{run}p{seq}t1"
        k1, k0 = 0.001, 0.05
        sens, off = 2.0, 0.1
        lines = []
        # block 1: filepaths (3 rows: info, fast, slow)
        lines.append("\t".join(["0", "3", "File Name"]))
        lines.append("\t".join(["1", "0", name + ".info"]))
        lines.append("\t".join(["2", "1", name + ".fast"]))
        lines.append("\t".join(["3", "2", name + ".slow"]))
        # block 2: statistics (fast row then slow row)
        lines.append("\t".join(
            ["0", "2", "Sampling Rate", "Number Channels", "Samples Acquired"]
        ))
        lines.append("\t".join(["1", "0", "40000", "2", "32"]))
        lines.append("\t".join(["2", "1", "1000", "2", "8"]))
        # block 3: daqconfig (1 dummy row)
        lines.append("\t".join(["0", "1", "Device"]))
        lines.append("\t".join(["1", "0", "PXI"]))
        # block 4: chanconfig
        cols = ["User Channel", "Coeff k1", "Coeff k0", "Sensitivity", "Offset"]
        if with_user_name:
            cols = ["User Name"] + cols
        lines.append("\t".join(["0", "2"] + cols))
        for ch in (1, 2):
            row = [f"K{ch:02d}"] if with_user_name else []
            row += [str(ch), str(k1), str(k0), str(sens), str(off)]
            lines.append("\t".join([str(ch), str(ch - 1)] + row))
        (d / (name + ".info")).write_text("\n".join(lines) + "\n")
        rng = np.random.default_rng(7)
        fast = rng.integers(-1000, 1000, size=(32, 2)).astype("<i4")
        slow = rng.integers(-1000, 1000, size=(8, 2)).astype("<i4")
        fast.tofile(d / (name + ".fast"))
        slow.tofile(d / (name + ".slow"))
        return name, (k1, k0, sens, off), fast, slow

    def test_read_info_and_scaling(self, tmp_path):
        pytest.importorskip("pandas")
        from upsp_tpu.processing.kulites import Kulites, read_info

        name, (k1, k0, sens, off), fast, slow = self._write_fixture(tmp_path)
        info = read_info(str(tmp_path / (name + ".info")))
        assert list(info.chanconfig.index) == ["K01", "K02"]
        assert float(info.statistics["Sampling Rate"][1]) == 1000

        kul = Kulites(str(tmp_path), 123, 4, f_type="slow")
        assert set(kul.data) == {"K01", "K02"}
        assert kul.sample_rate == 1000
        expect = (slow[:, 0] * k1 + k0 - off) / sens
        np.testing.assert_allclose(kul.data["K01"], expect, rtol=1e-6)

    def test_fast_stream_and_psf(self, tmp_path):
        pytest.importorskip("pandas")
        from upsp_tpu.processing.kulites import Kulites

        name, (k1, k0, sens, off), fast, slow = self._write_fixture(tmp_path)
        kul = Kulites(str(tmp_path), 123, 4, f_type="fast", psf=True)
        assert kul.sample_rate == 40000
        assert len(kul.data["K02"]) == 32
        expect = (fast[:, 1] * k1 + k0 - off) / sens * 144.0
        np.testing.assert_allclose(kul.data["K02"], expect, rtol=1e-6)

    def test_inferred_user_names(self, tmp_path):
        """v1-style chanconfig without 'User Name' -> K01/K02 inferred."""
        pytest.importorskip("pandas")
        from upsp_tpu.processing.kulites import read_info

        name, _, _, _ = self._write_fixture(tmp_path, with_user_name=False)
        info = read_info(str(tmp_path / (name + ".info")))
        assert list(info.chanconfig.index) == ["K01", "K02"]

    def test_find_info_files_patterns(self, tmp_path):
        from upsp_tpu.processing.kulites import find_info_files

        (tmp_path / "wtT123p4t1.info").write_text("")
        (tmp_path / "wtT999p9t1.info").write_text("")
        (tmp_path / "xr0123s004t1_S1C1.info").write_text("")
        found = find_info_files(str(tmp_path), 123, 4)
        names = sorted(os.path.basename(f) for f in found)
        assert names == ["wtT123p4t1.info", "xr0123s004t1_S1C1.info"]
