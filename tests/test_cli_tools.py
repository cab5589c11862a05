"""CLI smoke tests for the remaining tools: add-field, qsub-args, plotting."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = "/root/repo"


def run_cli(args, timeout=180):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", args[0])] + args[1:],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


class TestAddField:
    def test_appends_frames_dataset(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.io.hdf5io import PSPWriter
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        model = from_struct_grid(make_plate_grid(8, 6))
        n, f = model.size, 10
        h5 = str(tmp_path / "out.h5")
        with PSPWriter(h5, model, n_frames=f, transposed=True) as w:
            w.write_grid("in")
        data = np.arange(n * f, dtype="<f4").reshape(n, f)
        flat = str(tmp_path / "pressure_transpose")
        data.tofile(flat)

        r = run_cli(["upsp-add-field", h5, flat, "--frames", str(f),
                     "--block_nodes", "7"])
        assert r.returncode == 0, r.stderr
        with h5py.File(h5) as fh:
            np.testing.assert_array_equal(fh["frames"][...], data)

    def test_size_mismatch_rejected(self, tmp_path):
        pytest.importorskip("h5py")
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.io.hdf5io import PSPWriter
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        model = from_struct_grid(make_plate_grid(8, 6))
        h5 = str(tmp_path / "out.h5")
        with PSPWriter(h5, model, n_frames=4, transposed=True) as w:
            w.write_grid("in")
        flat = str(tmp_path / "bad")
        np.zeros(7, "<f4").tofile(flat)
        r = run_cli(["upsp-add-field", h5, flat, "--frames", "4"])
        assert r.returncode == 1
        assert "size mismatch" in r.stderr


class TestQsubArgs:
    def test_greedy_packing(self):
        r = run_cli(["upsp-qsub-args", "dp1", "dp2", "dp3", "dp4", "dp5",
                     "--est-minutes", "30", "--walltime-minutes", "60"])
        assert r.returncode == 0, r.stderr
        jobs = [l.split() for l in r.stdout.strip().splitlines()]
        assert jobs == [["dp1", "dp2"], ["dp3", "dp4"], ["dp5"]]

    def test_oversize_datapoint_gets_own_job(self):
        r = run_cli(["upsp-qsub-args", "dp1", "dp2",
                     "--est-minutes", "90", "--walltime-minutes", "60"])
        assert r.returncode == 0, r.stderr
        assert len(r.stdout.strip().splitlines()) == 2


class TestPlotting:
    def test_render_and_miniwall(self, tmp_path):
        pytest.importorskip("matplotlib")
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        grid_path = str(tmp_path / "g.grid")
        write_p3d_grid(grid_path, make_plate_grid(11, 9))
        ddir = tmp_path / "dp1_out"
        ddir.mkdir()
        np.random.default_rng(0).normal(size=99).astype("<f4").tofile(
            ddir / "rms"
        )
        images = tmp_path / "images" / "dp1"
        r = run_cli([
            "upsp-plotting", "render-images",
            "--grid", grid_path, "--data_dir", str(ddir),
            "--out_dir", str(images), "--fields", "rms", "missing_field",
        ])
        assert r.returncode == 0, r.stderr
        assert (images / "rms.png").exists()
        assert "skipping missing_field" in r.stderr

        r = run_cli([
            "upsp-plotting", "generate-miniwall",
            "--images_root", str(tmp_path / "images"),
        ])
        assert r.returncode == 0, r.stderr
        html = (tmp_path / "images" / "index.html").read_text()
        assert "dp1" in html and "rms.png" in html


class TestMakeProcessingTreeCLI:
    def test_generates_tree(self, tmp_path):
        data = {
            "datapoints": {
                "3000101": {
                    "run": 30001, "sequence": 1, "grid": "/g/a.grid",
                    "camera_videos": ["/v/300010101.mraw"],
                    "camera_calibrations": ["/c/cam01.json"],
                    "targets": "/t/a.tgts", "sds": "/w/a.wtd",
                }
            }
        }
        user = {"nas": {"qsub_args": {"q": "normal"}}}
        proc = {"processing": {"psp_process": {"filter": "gaussian"}}}
        for name, cfg in (("data", data), ("user", user), ("proc", proc)):
            (tmp_path / f"{name}.json").write_text(json.dumps(cfg))
        out = tmp_path / "tree"
        r = run_cli([
            "upsp-make-processing-tree", str(out),
            "--data", str(tmp_path / "data.json"),
            "--user", str(tmp_path / "user.json"),
            "--proc", str(tmp_path / "proc.json"),
        ])
        assert r.returncode == 0, r.stderr
        from upsp_tpu.processing.context import Pipeline

        dp = Pipeline(str(out)).datapoint("3000101")
        assert dp.name == "3000101"
