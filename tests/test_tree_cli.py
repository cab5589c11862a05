"""Batch tree generation + context + CLI smoke tests."""

import json
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from upsp_tpu.processing.context import Pipeline
from upsp_tpu.processing.tree import create, resolve_parameter_overlays

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def configs(tmp_path):
    data = {
        "datapoints": {
            "3000101": {"run": 30001, "sequence": 1, "grid": "/g/a.grid",
                        "camera_videos": ["/v/300010101.mraw"],
                        "camera_calibrations": ["/c/cam01.json"],
                        "targets": "/t/a.tgts", "sds": "/w/a.wtd"},
            "3000201": {"run": 30002, "sequence": 1, "grid": "/g/b_fine.grid",
                        "camera_videos": ["/v/300020101.mraw"]},
        }
    }
    user = {"nas": {"qsub_args": {"q": "normal"}}}
    proc = {
        "processing": {
            "psp_process": {
                "filter": "gaussian",
                "filter_size": 3,
                "oblique_angle": 70,
                "__overlays__": [
                    {"__regex__": {"grid": "fine"}, "filter_size": 5}
                ],
            }
        }
    }
    paths = {}
    for name, cfg in (("data", data), ("user", user), ("proc", proc)):
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(cfg))
        paths[name] = str(p)
    return paths, tmp_path


class TestOverlays:
    def test_regex_overlay_applies(self, configs):
        paths, tmp = configs
        data = json.loads(open(paths["data"]).read())
        proc = json.loads(open(paths["proc"]).read())
        out = resolve_parameter_overlays(proc["processing"], data["datapoints"])
        assert out["3000101"]["psp_process"]["filter_size"] == 3
        assert out["3000201"]["psp_process"]["filter_size"] == 5  # fine grid

    def test_name_regex(self):
        proc = {"step": {"a": 1, "__overlays__": [
            {"__regex__": {"name": "^30002"}, "a": 2}]}}
        dps = {"3000101": {}, "3000201": {}}
        out = resolve_parameter_overlays(proc, dps)
        assert out["3000101"]["step"]["a"] == 1
        assert out["3000201"]["step"]["a"] == 2


class TestTree:
    def test_create_and_context(self, configs):
        paths, tmp = configs
        root = create(str(tmp / "tree"), paths["data"], paths["user"], paths["proc"])
        assert os.path.exists(os.path.join(root, "context.json"))
        assert os.path.exists(os.path.join(root, "03_launchers", "step+psp_process"))
        deck = os.path.join(root, "04_processing", "psp_process", "3000101",
                            "input_deck.inp")
        assert os.path.exists(deck)
        text = open(deck).read()
        assert "@camera" in text and "300010101.mraw" in text
        # launcher is executable
        st = os.stat(os.path.join(root, "03_launchers", "step+psp_process"))
        assert st.st_mode & stat.S_IXUSR

        pipe = Pipeline(root)
        assert len(pipe.datapoints) == 2
        dp = pipe.datapoint("3000101")
        assert dp.inputs["run"] == 30001
        assert dp.processing["psp_process"]["filter_size"] == 3
        assert dp.input_deck_path() == deck


class TestCLIs:
    def _run(self, script, *args):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script), *args],
            capture_output=True, text=True, env=env, timeout=120,
        )

    def test_xyz_scalar_to_tbl(self, tmp_path):
        for name, vals in (("X", [1, 2]), ("Y", [3, 4]), ("Z", [5, 6]),
                           ("s", [7, 8])):
            np.array(vals, "<f4").tofile(tmp_path / name)
        out = tmp_path / "out.tbl"
        r = self._run(
            "upsp-xyz-scalar-to-tbl",
            "--x", str(tmp_path / "X"), "--y", str(tmp_path / "Y"),
            "--z", str(tmp_path / "Z"), "--scalar", str(tmp_path / "s"),
            "--out", str(out),
        )
        assert r.returncode == 0, r.stderr
        text = out.read_text()
        assert "ZONE I=2" in text and "1 3 5 7" in text

    def test_matrix_transpose(self, tmp_path, rng):
        rows, cols = 10, 7
        data = rng.normal(size=(rows, cols)).astype("<f4")
        src = tmp_path / "pressure"
        data.tofile(src)
        dst = tmp_path / "pressure_transpose"
        r = self._run("upsp-matrix-transpose", str(src), str(dst),
                      "--rows", str(rows), "--cols", str(cols), "--block", "4")
        assert r.returncode == 0, r.stderr
        out = np.fromfile(dst, "<f4").reshape(cols, rows)
        np.testing.assert_array_equal(out, data.T)

    def test_extract_frames(self, tmp_path):
        mraw = "/root/reference/cpp/test/mraw/12bitMRAW.mraw"
        if not os.path.exists(mraw):
            pytest.skip("no mraw fixture")
        out = tmp_path / "f.%03d.png"
        r = self._run("upsp-extract-frames", "-input", mraw,
                      "-output", str(out), "-count", "2")
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "f.000.png").exists()


class TestProcessCLI:
    def _run(self, script, *args):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script), *args],
            capture_output=True, text=True, env=env, timeout=240,
        )

    def test_full_cli_with_real_video(self, tmp_path):
        """upsp-process from an input deck with the real .mraw fixture."""
        import json as _json

        import numpy as np

        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        mraw = "/root/reference/cpp/test/mraw/12bitMRAW.mraw"
        if not os.path.exists(mraw):
            pytest.skip("no mraw fixture")

        grid_path = str(tmp_path / "plate.grid")
        write_p3d_grid(grid_path, make_plate_grid(21, 17))
        cam_path = str(tmp_path / "cam.json")
        with open(cam_path, "w") as fh:
            _json.dump(
                {
                    "uPSP_cameraMatrix": [[1500.0, 0, 0], [0, 1500.0, 0],
                                          [0, 0, 1.0]],
                    "distCoeffs": [[0, 0, 0, 0, 0]],
                    "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "tvec": [-5.0, 4.0, 20.0],
                },
                fh,
            )
        wtd = tmp_path / "t.wtd"
        wtd.write_text(
            "RUN 1 1\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n"
            "0.80\t0.00\t0.00\t0.00\t144.00\t500.00\t80.00\t0.00\n"
        )
        paint = tmp_path / "paint.cal"
        paint.write_text("a = 1.0\nb = 0\nc = 0\nd = 0\ne = 0\nf = 0\n")
        out_dir = tmp_path / "out"
        deck = tmp_path / "deck.inp"
        deck.write_text(
            "\n".join(
                [
                    "@general",
                    "  test = clitest",
                    "  run = 1",
                    "  sequence = 1",
                    "@vars",
                    f"  root = {tmp_path}",
                    "@all",
                    f"  grid = $root/plate.grid",
                    f"  sds = {wtd}",
                    f"  paint_calibration = {paint}",
                    "@camera",
                    "  number = 1",
                    f"  video = {mraw}",
                    f"  calibration = {cam_path}",
                    "@options",
                    "  registration = none",
                    "  target_patcher = none",
                    "  filter = gaussian",
                    "  filter_size = 3",
                    "@output",
                    f"  dir = {out_dir}",
                    "  name = clitest",
                    "",
                ]
            )
        )
        r = self._run("upsp-process", "-input_deck", str(deck))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "processed 2 frames" in r.stdout
        assert (out_dir / "pressure_transpose").exists()
        assert (out_dir / "intensity_avg").exists()
        # 2 frames x 357 nodes of float32
        assert (out_dir / "intensity").stat().st_size == 2 * 357 * 4


class TestExternalCalibrationCLI:
    def _run(self, script, *args):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script), *args],
            capture_output=True, text=True, env=env, timeout=400,
        )

    @pytest.mark.slow
    def test_two_camera_joint_ba(self, tmp_path):
        ref = "/root/reference/test/data"
        if not os.path.exists(ref):
            pytest.skip("no reference data")
        # STRUTZ=0 wtd: the tunnel chain is ~identity, so the stored wind-on
        # poses are their own initial guesses (the CLI mechanics under test)
        wtd = tmp_path / "t.wtd"
        wtd.write_text(
            "RUN 8 2\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n"
            "0.85\t0.00\t0.00\t0.00\t350.00\t600.00\t85.00\t0.00\n"
        )
        r = self._run(
            "upsp-external-calibration",
            "--tgts", f"{ref}/fml_tc3_volume.tgts",
            "--grd", f"{ref}/fml_tc3_volume.grid",
            "--wtd", str(wtd),
            "--cfg", f"{ref}/test_config.json",
            "--cal_dir", f"{ref}/camera-tunnel-calibration",
            "--img",
            f"{ref}/images/CAM1_RUN8_CINE02_Y20000209H11294501.00001.png",
            f"{ref}/images/CAM5_RUN8_CINE02_Y20220209H11291505.00001.png",
            "--out_dir", str(tmp_path),
            "--joint_ba",
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "joint BA over 2 cameras" in r.stdout
        import json as _json

        import numpy as np

        for num in (1, 2):
            path = tmp_path / f"cam{num:02d}-to-model.json"
            assert path.exists(), r.stdout
            cal = _json.loads(path.read_text())
            rmat = np.array(cal["rmat"])
            np.testing.assert_allclose(rmat @ rmat.T, np.eye(3), atol=1e-6)
            # solved pose should stay near the wind-off chain for this fixture
            orig = _json.loads(
                open(f"{ref}/camera-tunnel-calibration/camera0{1 if num==1 else 5}_35_6.json").read()
            )
            t_orig = np.array(orig["tvec"]) + [0, 0, 10.0 * 0]  # strutz folded in chain
            assert np.linalg.norm(np.array(cal["tvec"])) < 50


class TestVVCompare:
    def _run(self, script, *args):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script), *args],
            capture_output=True, text=True, env=env, timeout=60,
        )

    def test_match_and_mismatch(self, tmp_path):
        a = tmp_path / "a"; b = tmp_path / "b"
        a.mkdir(); b.mkdir()
        v = np.arange(100, dtype="<f4")
        v.tofile(a / "vv-int-avg.dat")
        v.tofile(b / "vv-int-avg.dat")
        r = self._run("upsp-vv-compare", str(a), str(b))
        assert r.returncode == 0 and "OK" in r.stdout
        (v + 0.001).astype("<f4").tofile(b / "vv-int-avg.dat")
        r = self._run("upsp-vv-compare", str(a), str(b))
        assert r.returncode == 1 and "MISMATCH" in r.stdout
        r = self._run("upsp-vv-compare", str(a), str(b), "--atol", "0.01")
        assert r.returncode == 0
