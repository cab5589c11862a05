"""I/O layer tests against the real reference fixtures + round-trips."""

import numpy as np
import pytest

from upsp_tpu.io import (
    PaintCalibration,
    read_camera_json,
    read_p3d_function,
    read_p3d_grid,
    read_tgts,
    read_tgts_header,
    read_wtd,
    write_p3d_function,
    write_p3d_grid,
)
from upsp_tpu.io.plot3d import StructGrid
from upsp_tpu.io.wtd import model_temperature


class TestPlot3D:
    def test_read_fml_grid(self, fml_grid):
        assert fml_grid.n_zones == 14
        assert fml_grid.size == sum(int(np.prod(s)) for s in fml_grid.sz)
        assert fml_grid.sz[0][0] == 21 and fml_grid.sz[0][1] == 41
        # node coordinates should be finite and in a sane range (inches)
        xyz = fml_grid.xyz()
        assert np.all(np.isfinite(xyz))
        assert np.abs(xyz).max() < 100

    def test_triangulation_counts(self, fml_grid):
        tris = fml_grid.triangles()
        assert tris.shape[0] == fml_grid.num_faces()
        assert tris.min() >= 0 and tris.max() < fml_grid.size

    def test_grid_roundtrip(self, tmp_path, fml_grid):
        path = str(tmp_path / "g.grid")
        write_p3d_grid(path, fml_grid)
        back = read_p3d_grid(path)
        np.testing.assert_array_equal(back.x, fml_grid.x)
        np.testing.assert_array_equal(back.z, fml_grid.z)
        assert len(back.sz) == fml_grid.n_zones

    def test_function_roundtrip(self, tmp_path, fml_grid):
        vals = np.arange(fml_grid.size, dtype=np.float32)
        path = str(tmp_path / "f.p3d")
        write_p3d_function(path, fml_grid.sz, vals)
        back = read_p3d_function(path)
        np.testing.assert_array_equal(back, vals)


class TestTgts:
    def test_read_targets(self, ref_data):
        targets = read_tgts(str(ref_data / "fml_tc3_volume.tgts"))
        assert len(targets) > 0
        assert all(t.target_type == "dot" for t in targets)
        t1 = targets[0]
        assert t1.idx == 1
        np.testing.assert_allclose(t1.xyz, [-10.7003, -2.0337, -7.0])
        np.testing.assert_allclose(t1.norm, [0.0, -0.0, 1.0])
        assert t1.diameter == pytest.approx(0.063)
        assert t1.name == "st01"

    def test_header(self, ref_data):
        hdr = read_tgts_header(str(ref_data / "fml_tc3_volume.tgts"))
        assert hdr["GRID_FILE"] == "fml_tc3_volume.grid"
        assert float(hdr["GRID_TOLERANCE"]) == pytest.approx(0.388202)


class TestWtd:
    def test_read(self, ref_data):
        cond = read_wtd(str(ref_data / "wtd_test.wtd"))
        assert cond.mach == pytest.approx(1.0)
        assert cond.alpha == pytest.approx(0.05)
        assert cond.beta == pytest.approx(0.12)
        assert cond.phi == pytest.approx(0.90)
        assert cond.strutz == pytest.approx(10.0)

    def test_model_temperature_recovery(self, ref_data):
        cond = read_wtd(str(ref_data / "wtd_test.wtd"))
        cond.ttot = 100.0
        cond.mach = 1.0
        cond.tcavg = float("nan")
        # manual recomputation of the recovery-factor formula
        ttot_r = 100.0 + 459.67
        t_inf = ttot_r / (1.0 + 0.2 * 1.0) - 459.67
        expect = 0.896 * (100.0 - t_inf) + t_inf
        assert model_temperature(cond) == pytest.approx(expect, rel=1e-6)

    def test_tcavg_supersedes(self, ref_data):
        cond = read_wtd(str(ref_data / "wtd_test.wtd"))
        cond.ttot, cond.mach, cond.tcavg = 100.0, 1.0, 72.5
        assert model_temperature(cond) == 72.5


class TestPaint:
    def test_gain_formula(self, tmp_path):
        p = tmp_path / "paint.cal"
        p.write_text("a = 1.0\nb = 0.5\nc = 0.01\nd = 2.0\ne = 0.1\nf = 0.001\n")
        pc = PaintCalibration.read(str(p))
        T, Pss = 75.0, 144.0
        expect = 1.0 + 0.5 * T + 0.01 * T * T + (2.0 + 0.1 * T + 0.001 * T * T) * Pss
        assert pc.get_gain(T, Pss) == pytest.approx(expect)


class TestCameraJson:
    def test_read_camera01(self, ref_data):
        cal = read_camera_json(
            str(ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"),
            dims_hw=(512, 1024),
        )
        # principal point converted from center-relative to absolute
        assert cal.camera_matrix[0, 2] == pytest.approx(1024 / 2 + 21.908701486902032)
        assert cal.camera_matrix[1, 2] == pytest.approx(512 / 2 + 0.778541140320840)
        assert cal.camera_matrix[0, 0] == pytest.approx(1380.2632820187425)
        assert cal.dist_coeffs[0] == pytest.approx(-0.09098491035825468)
        assert cal.rmat.shape == (3, 3)
        # rmat should be a rotation
        np.testing.assert_allclose(cal.rmat @ cal.rmat.T, np.eye(3), atol=1e-6)

    def test_roundtrip(self, ref_data, tmp_path):
        from upsp_tpu.io import write_camera_json

        cal = read_camera_json(
            str(ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"),
            dims_hw=(512, 1024),
        )
        out = str(tmp_path / "cam.json")
        write_camera_json(out, cal)
        back = read_camera_json(out, dims_hw=(512, 1024))
        np.testing.assert_allclose(back.camera_matrix, cal.camera_matrix)
        np.testing.assert_allclose(back.rmat, cal.rmat)
        np.testing.assert_allclose(back.tvec, cal.tvec)


class TestSurfaceModel:
    def test_model_build(self, fml_model):
        m = fml_model
        assert m.size == m.vertices.shape[0]
        assert m.triangles.shape[0] > 0
        # unit normals
        lens = np.linalg.norm(m.normals, axis=1)
        assert np.all((np.abs(lens - 1.0) < 1e-4) | (lens == 0.0))
        # overlap tolerance should have produced some superseded nodes
        assert (~m.is_datanode).sum() > 0
        assert m.is_datanode.sum() > 0

    def test_adjust_solution(self, fml_model):
        m = fml_model
        sol = np.arange(m.size, dtype=np.float32)
        adj = m.adjust_solution(sol)
        sup = ~m.is_datanode
        np.testing.assert_array_equal(adj[sup], m.superseded_by[sup].astype(np.float32))
        np.testing.assert_array_equal(adj[~sup], sol[~sup])

    def test_nearest_node(self, fml_model):
        m = fml_model
        idx = m.nearest_node(m.vertices[100] + 1e-4)
        assert np.linalg.norm(m.vertices[idx[0]] - m.vertices[100]) < 1e-2


class TestCart3D:
    def _mesh(self):
        from upsp_tpu.io.cart3d import TriMesh

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1]],
            np.float32,
        )
        tris = np.array([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], np.int32)
        comps = np.array([1, 1, 2, 2], np.int32)
        return TriMesh(vertices=verts, triangles=tris, components=comps)

    def test_ascii_tri_roundtrip(self, tmp_path):
        from upsp_tpu.io.cart3d import read_tri, write_tri

        mesh = self._mesh()
        p = str(tmp_path / "m.tri")
        write_tri(p, mesh)
        back = read_tri(p)
        np.testing.assert_allclose(back.vertices, mesh.vertices, rtol=1e-6)
        np.testing.assert_array_equal(back.triangles, mesh.triangles)
        np.testing.assert_array_equal(back.components, mesh.components)

    def test_binary_triq_roundtrip(self, tmp_path, rng):
        from upsp_tpu.io.cart3d import read_triq, write_triq

        mesh = self._mesh()
        cp = rng.normal(size=(5, 1)).astype(np.float32)
        p = str(tmp_path / "m.triq")
        write_triq(p, mesh, scalars=cp)
        back = read_triq(p)
        np.testing.assert_array_equal(back.vertices, mesh.vertices)
        np.testing.assert_array_equal(back.triangles, mesh.triangles)
        np.testing.assert_array_equal(back.components, mesh.components)
        np.testing.assert_allclose(back.scalars, cp)

    def test_unstructured_pipeline(self, tmp_path):
        """Full phase0+1 on an unstructured (.tri) model."""
        import json as _json

        from upsp_tpu.io.cart3d import TriMesh, write_tri
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.run import run_datapoint

        # flat triangulated plate z=0, normals +z
        n = 9
        xs, ys = np.meshgrid(np.linspace(0, 10, n), np.linspace(0, 8, n))
        verts = np.stack(
            [xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1
        ).astype(np.float32)
        tris = []
        for j in range(n - 1):
            for i in range(n - 1):
                a = j * n + i
                tris += [[a, a + 1, a + n + 1], [a, a + n + 1, a + n]]
        mesh = TriMesh(
            vertices=verts,
            triangles=np.array(tris, np.int32),
            components=np.ones(len(tris), np.int32),
        )
        tri_path = str(tmp_path / "plate.tri")
        write_tri(tri_path, mesh)
        cam_path = str(tmp_path / "cam.json")
        with open(cam_path, "w") as fh:
            _json.dump(
                {
                    "uPSP_cameraMatrix": [[200.0, 0, 0], [0, 200.0, 0], [0, 0, 1]],
                    "distCoeffs": [[0, 0, 0, 0, 0]],
                    "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "tvec": [-5.0, 4.0, 20.0],
                },
                fh,
            )
        cfg = ProcessingConfig(
            cameras=[CameraInputs(number=1, calibration=cam_path)],
            grid=tri_path,
            registration="none",
            target_patcher="none",
        )
        frames = np.full((3, 1, 96, 128), 2000.0, np.float32)
        out = run_datapoint(cfg, frames_array=frames)
        vis = np.array(out.state.projections[0].visible)
        assert vis.sum() > 60  # most plate nodes project
        np.testing.assert_allclose(
            out.intensity[0][vis], 2000.0, rtol=1e-4
        )
