"""Hexahedral panel construction + F&M integration (integration.h parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from upsp_tpu.geometry.grids import from_struct_grid
from upsp_tpu.io.plot3d import StructGrid
from upsp_tpu.ops.integration import integrate_panels, integration_matrices
from upsp_tpu.ops.panels import (
    assign_points_to_panels,
    panel_coverage,
    panel_node_map,
    panels_from_grid,
)
from upsp_tpu.pipeline.synthetic import make_plate_grid


def _volume_plate(imax=5, jmax=4, lx=8.0, ly=6.0, h=1.0):
    """Two-layer volume grid: plate extruded from z=-h/2 to z=+h/2."""
    s = make_plate_grid(imax, jmax, lx, ly)
    g = StructGrid()
    g.sz = [np.array([imax, jmax, 2], np.int32)]
    g.x = np.tile(s.x, 2).astype(np.float32)
    g.y = np.tile(s.y, 2).astype(np.float32)
    g.z = np.concatenate(
        [np.full(s.size, -h / 2), np.full(s.size, h / 2)]
    ).astype(np.float32)
    g.zones = np.zeros(2 * s.size, np.int32)
    return g


class TestSurfacePanels:
    def test_counts_and_centers(self):
        grid = make_plate_grid(5, 4, 8.0, 6.0)
        panels = panels_from_grid(grid, height_sf=1.0)
        assert panels.size == 4 * 3
        # first panel center = centroid of the (0,0) quad
        np.testing.assert_allclose(panels.centers[0], [1.0, 1.0, 0.0], atol=1e-6)

    def test_point_assignment(self):
        grid = make_plate_grid(5, 4, 8.0, 6.0)  # 2x2 quads of size 2
        panels = panels_from_grid(grid, height_sf=1.0)
        pts = np.array(
            [
                [1.0, 1.0, 0.0],   # inside panel 0
                [3.0, 1.0, 0.3],   # panel 1 (within extruded height)
                [1.0, 3.0, -0.3],  # second row -> panel 4
                [1.0, 1.0, 5.0],   # far above every panel
                [50.0, 1.0, 0.0],  # off the plate
            ]
        )
        idx = assign_points_to_panels(pts, panels)
        assert idx[0] == 0 and idx[1] == 1 and idx[2] == 4
        assert idx[3] == -1 and idx[4] == -1

    def test_height_sf_scales_capture(self):
        grid = make_plate_grid(5, 4, 8.0, 6.0)
        thin = panels_from_grid(grid, height_sf=0.1)  # half-height 0.1
        pts = np.array([[1.0, 1.0, 0.3]])
        assert assign_points_to_panels(pts, thin)[0] == -1
        thick = panels_from_grid(grid, height_sf=1.0)  # half-height 1.0
        assert assign_points_to_panels(pts, thick)[0] == 0


class TestVolumePanels:
    def test_volume_grid(self):
        vol = _volume_plate()
        panels = panels_from_grid(vol)
        assert panels.size == 4 * 3
        assert panels.surface is not None
        # surface at the l-midpoint: z == 0
        np.testing.assert_allclose(panels.surface.z, 0.0, atol=1e-6)
        idx = assign_points_to_panels(np.array([[1.0, 1.0, 0.2]]), panels)
        assert idx[0] == 0
        # outside the extrusion
        idx = assign_points_to_panels(np.array([[1.0, 1.0, 0.8]]), panels)
        assert idx[0] == -1

    def test_volume_requires_l2(self):
        vol = _volume_plate()
        vol.sz = [np.array([5, 4, 3], np.int32)]
        with pytest.raises(ValueError):
            panels_from_grid(vol)


class TestPanelIntegration:
    def test_constant_cp_total_force(self):
        """Sum of per-panel Fz under Cp=1 equals -total_area (normal +z)."""
        fine = make_plate_grid(17, 13, 8.0, 6.0)
        model = from_struct_grid(fine)
        panels = panels_from_grid(make_plate_grid(5, 4, 8.0, 6.0))
        p_of_n = panel_node_map(model, panels)
        assert (p_of_n >= 0).all()
        op = integration_matrices(model, panel_of_node=p_of_n)
        assert op.shape[0] == panels.size
        cp = jnp.ones(model.size, jnp.float32)
        fomo = integrate_panels(jnp.asarray(op), cp)
        np.testing.assert_allclose(float(fomo.fz.sum()), -48.0, rtol=1e-5)
        np.testing.assert_allclose(float(fomo.fx.sum()), 0.0, atol=1e-5)
        # moment about origin for F = (0, 0, -dA):
        # Mx = integral(-y dA) = -area*cy, My = integral(+x dA) = +area*cx
        np.testing.assert_allclose(float(fomo.mx.sum()), -48.0 * 3.0, rtol=1e-5)
        np.testing.assert_allclose(float(fomo.my.sum()), 48.0 * 4.0, rtol=1e-5)

    def test_coverage(self):
        fine = make_plate_grid(17, 13, 8.0, 6.0)
        model = from_struct_grid(fine)
        panels = panels_from_grid(make_plate_grid(5, 4, 8.0, 6.0))
        p_of_n = panel_node_map(model, panels)
        area, frac = panel_coverage(model, p_of_n, panels.size)
        np.testing.assert_allclose(area.sum(), 48.0, rtol=1e-5)
        np.testing.assert_allclose(frac, 1.0, atol=1e-6)
        # kill data on the left half -> left panels lose coverage
        mask = model.vertices[:, 0] > 4.0
        _, frac2 = panel_coverage(model, p_of_n, panels.size, data_mask=mask)
        assert frac2[0] < 0.6 and frac2[panels.size - 1] > 0.9


class TestIntegrateForcesCLI:
    def test_cli_end_to_end(self, tmp_path):
        import os
        import subprocess
        import sys

        from upsp_tpu.io.plot3d import write_p3d_grid

        REPO = "/root/repo"
        fine = make_plate_grid(17, 13, 8.0, 6.0)
        model = from_struct_grid(fine)
        grid_path = str(tmp_path / "model.grid")
        write_p3d_grid(grid_path, fine)
        pgrid_path = str(tmp_path / "panels.g")
        write_p3d_grid(pgrid_path, make_plate_grid(5, 4, 8.0, 6.0))
        F = 6
        pt = np.ones((model.size, F), np.float32)
        pt_path = str(tmp_path / "pressure_transpose")
        pt.astype("<f4").tofile(pt_path)

        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "upsp-integrate-forces"),
             "--grid", grid_path, "--panel-grid", pgrid_path,
             "--pressure", pt_path, "--out", str(tmp_path / "fomo_out")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=180,
        )
        assert r.returncode == 0, r.stderr
        fomo = np.fromfile(str(tmp_path / "fomo_out" / "fomo"), "<f4").reshape(
            12, 6, F
        )
        # Cp=1 everywhere: total Fz per frame = -plate area
        np.testing.assert_allclose(fomo[:, 2, :].sum(axis=0), -48.0, rtol=1e-5)
        lines = (tmp_path / "fomo_out" / "panels.csv").read_text().splitlines()
        assert len(lines) == 13 and lines[0].startswith("panel,")


class TestOperatorRowAlignment:
    def test_unassigned_nodes_keep_rows_aligned(self, tmp_path):
        """Panels covering only part of the model: operator row i must stay
        panel id i (unassigned nodes dropped), and the CLI must not crash or
        shift rows (regression: np.unique compacted away the -1 bucket and
        empty panels, misaligning fomo with panels.csv)."""
        import os
        import subprocess
        import sys

        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.ops.integration import integration_matrices
        from upsp_tpu.ops.panels import panel_node_map, panels_from_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        fine = make_plate_grid(25, 19, 8.0, 6.0)
        model = from_struct_grid(fine)
        # panel grid covers only the left HALF of the plate -> right-half
        # nodes unassigned (-1), and some panels may be empty
        half = make_plate_grid(4, 4, 4.0, 6.0)
        panels = panels_from_grid(half)
        p_of_n = panel_node_map(model, panels)
        assert (p_of_n == -1).any()

        op = integration_matrices(model, panel_of_node=p_of_n,
                                  n_panels=panels.size)
        assert op.shape[0] == panels.size
        # each panel row's support is its own nodes plus boundary-triangle
        # corners (first-node-wins tri assignment): every touched node with
        # an assignment belongs to SOME panel, and the row's majority
        # support is its own panel
        for i in range(panels.size):
            touched = np.nonzero(op[i, 2, :])[0]
            if touched.size:
                own = (p_of_n[touched] == i).mean()
                assert own > 0.5, (i, own)
        # nodes deep inside the uncovered half (well away from the panel
        # boundary) contribute to NO panel
        deep = np.nonzero(model.vertices[:, 0] > 6.0)[0]
        assert deep.size > 0
        assert np.abs(op[:, :, deep]).max() == 0.0
        assert np.isfinite(op).all()

        # CLI end-to-end with partial coverage
        grid_path = str(tmp_path / "model.grid")
        write_p3d_grid(grid_path, fine)
        pgrid_path = str(tmp_path / "panels_half.g")
        write_p3d_grid(pgrid_path, half)
        F = 4
        pt = np.ones((model.size, F), np.float32)
        pt_path = str(tmp_path / "pressure_transpose")
        pt.astype("<f4").tofile(pt_path)
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "upsp-integrate-forces"),
             "--grid", grid_path, "--panel-grid", pgrid_path,
             "--pressure", pt_path, "--out", str(tmp_path / "out")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=180,
        )
        assert r.returncode == 0, r.stderr
        fomo = np.fromfile(str(tmp_path / "out" / "fomo"), "<f4").reshape(
            panels.size, 6, F
        )
        # Cp=1: total Fz ~= -(covered area) ~= -half the plate
        total_fz = fomo[:, 2, 0].sum()
        assert -28.0 < total_fz < -22.0  # half plate (24) + boundary ring


class TestFrameMajorH5Input:
    def test_cli_reads_frame_major_h5(self, tmp_path):
        """upsp-integrate-forces handles the reference's frame-major (F, N)
        HDF5 layout (transpose attr 0) — regression for node/frame-axis
        confusion."""
        import os
        import subprocess
        import sys

        h5py = pytest.importorskip("h5py")
        from upsp_tpu.io.hdf5io import PSPWriter
        from upsp_tpu.io.plot3d import write_p3d_grid

        REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        fine = make_plate_grid(17, 13, 8.0, 6.0)
        model = from_struct_grid(fine)
        grid_path = str(tmp_path / "model.grid")
        write_p3d_grid(grid_path, fine)
        pgrid_path = str(tmp_path / "panels.g")
        write_p3d_grid(pgrid_path, make_plate_grid(5, 4, 8.0, 6.0))
        F = 6
        h5 = str(tmp_path / "out.h5")
        with PSPWriter(h5, model, n_frames=F, transposed=False) as w:
            w.write_grid("in")
            w.write_frames_block(np.ones((model.size, F), np.float32))
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "upsp-integrate-forces"),
             "--grid", grid_path, "--panel-grid", pgrid_path,
             "--pressure", h5, "--out", str(tmp_path / "out")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=180,
        )
        assert r.returncode == 0, r.stderr
        fomo = np.fromfile(str(tmp_path / "out" / "fomo"), "<f4").reshape(
            12, 6, F
        )
        np.testing.assert_allclose(fomo[:, 2, :].sum(axis=0), -48.0, rtol=1e-5)


class TestSplitModel:
    def test_components_follow_panels(self):
        """split_model labels triangles/nodes with containing-panel ids
        (integration.h:171 component-setting role); outside -> -1."""
        from upsp_tpu.ops.panels import (
            assign_triangles_to_panels,
            split_model,
        )

        fine = make_plate_grid(25, 19, 8.0, 6.0)
        model = from_struct_grid(fine)
        half = make_plate_grid(4, 4, 4.0, 6.0)  # covers left half only
        panels = panels_from_grid(half)

        tri_panel = assign_triangles_to_panels(model, panels)
        assert tri_panel.shape[0] == model.triangles.shape[0]
        centroids = model.vertices[model.triangles].mean(axis=1)
        left = centroids[:, 0] < 3.8
        right = centroids[:, 0] > 4.2
        assert (tri_panel[left] >= 0).all()
        assert (tri_panel[right] == -1).all()

        split = split_model(model, panels)
        assert split.components.shape == (model.size,)
        deep_right = model.vertices[:, 0] > 4.5
        assert (split.components[deep_right] == -1).all()
        deep_left = model.vertices[:, 0] < 3.5
        assert (split.components[deep_left] >= 0).all()
        # panel ids are valid PanelSet indices
        assert split.components.max() < panels.size
