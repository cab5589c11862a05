"""Tests for node-pixel mapping, panel integration, target bumping, timing."""

import numpy as np
import pytest

import jax.numpy as jnp

from upsp_tpu.camera.model import make_camera_params, project_points, rot
from upsp_tpu.ops.integration import (
    integrate_panels,
    integrate_time_history,
    integration_matrices,
)
from upsp_tpu.ops.node_pixel_mapping import (
    keyframe_mapping,
    remap,
    remap_error_bound,
)
from upsp_tpu.utils.timing import BlockTimer, StageClock


@pytest.fixture
def camera(rng):
    K = np.array([[800.0, 0, 256], [0, 800.0, 256], [0, 0, 1]])
    rmat = np.diag([1.0, -1.0, -1.0])
    tvec = np.array([0.0, 0.0, 15.0])
    return make_camera_params(rmat, tvec, K, np.zeros(5))


class TestNodePixelMapping:
    def test_keyframe_matches_projection(self, camera, rng):
        pts = rng.uniform(-3, 3, (50, 3)) * [1, 1, 0.1]
        m = keyframe_mapping(camera, jnp.asarray(pts))
        np.testing.assert_allclose(
            np.array(m.uv), np.array(project_points(camera, jnp.asarray(pts))),
            atol=1e-10,
        )

    def test_remap_first_order_accuracy(self, camera, rng):
        pts = rng.uniform(-3, 3, (50, 3)) * [1, 1, 0.1]
        m = keyframe_mapping(camera, jnp.asarray(pts))
        d = jnp.asarray([1e-3, -5e-4, 8e-4, 0.002, -0.001, 0.003])
        new_pose = m.pose + d
        approx = np.array(remap(m, new_pose))
        exact_params = camera._replace(rvec=new_pose[:3], tvec=new_pose[3:6])
        exact = np.array(project_points(exact_params, jnp.asarray(pts)))
        # first-order remap: error O(|d|^2) ~ sub-millipixel here
        assert np.abs(approx - exact).max() < 5e-3

    def test_error_bound_scales(self, camera, rng):
        pts = rng.uniform(-3, 3, (20, 3)) * [1, 1, 0.1]
        m = keyframe_mapping(camera, jnp.asarray(pts))
        small = np.array(remap_error_bound(m, m.pose + 1e-4)).max()
        large = np.array(remap_error_bound(m, m.pose + 1e-2)).max()
        assert large > 50 * small


class TestIntegration:
    def _plate_model(self):
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        return from_struct_grid(make_plate_grid(11, 9, lx=2.0, ly=1.0))

    def test_uniform_cp_force(self):
        model = self._plate_model()
        op = jnp.asarray(integration_matrices(model))
        cp = jnp.ones(model.size)
        fomo = integrate_panels(op, cp)
        # plate area 2x1 normal +z, Cp=1 -> fz = -area
        assert float(fomo.fz.sum()) == pytest.approx(-2.0, rel=1e-5)
        assert abs(float(fomo.fx.sum())) < 1e-6
        assert abs(float(fomo.fy.sum())) < 1e-6

    def test_moment_about_center(self):
        model = self._plate_model()
        # moments about the plate center vanish for uniform load
        op = jnp.asarray(
            integration_matrices(model, moment_center=(1.0, 0.5, 0.0))
        )
        fomo = integrate_panels(op, jnp.ones(model.size))
        assert abs(float(fomo.mx.sum())) < 1e-5
        assert abs(float(fomo.my.sum())) < 1e-5

    def test_time_history_shape(self, rng):
        model = self._plate_model()
        op = jnp.asarray(integration_matrices(model))
        hist = rng.normal(size=(model.size, 16)).astype(np.float32)
        out = integrate_time_history(op, jnp.asarray(hist))
        assert out.shape == (op.shape[0], 6, 16)


class TestTargetBumping:
    def test_internal_target_bumped(self):
        from upsp_tpu.camera.target_bumping import tgts_bumper
        from upsp_tpu.camera.visibility import VisibilityChecker
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        model = from_struct_grid(make_plate_grid(21, 17))
        vis = VisibilityChecker(model, 70.0)
        targets = [
            {  # under the plate (z<0, plate at z=0, normal +z)
                "tvec": np.array([5.0, 4.0, -0.01]),
                "norm": np.array([0.0, 0.0, 1.0]),
                "idx": 1,
            },
            {  # already proud
                "tvec": np.array([3.0, 2.0, 0.02]),
                "norm": np.array([0.0, 0.0, 1.0]),
                "idx": 2,
            },
        ]
        bumped, dist, n = tgts_bumper(targets, vis)
        assert n == 1
        assert dist[0] > 0.0099  # pushed up past the surface
        assert dist[1] == 0.0
        assert bumped[0]["tvec"][2] > 0.0


class TestTiming:
    def test_block_timer(self):
        with BlockTimer("x", enabled=False) as t:
            pass
        assert t.elapsed >= 0.0

    def test_stage_clock(self):
        clk = StageClock(enabled=False)
        clk.point("a")
        clk.point("b")
        assert len(clk.records) == 2
        assert "stage" in clk.summary()
