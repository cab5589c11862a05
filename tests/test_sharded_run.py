"""Sharded full-pipeline correctness: 8-device mesh vs single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upsp_tpu.io.paint import PaintCalibration
from upsp_tpu.io.wtd import TunnelConditions
from upsp_tpu.parallel.mesh import make_mesh
from upsp_tpu.parallel.sharded_run import run_sharded
from upsp_tpu.pipeline.phase1 import phase1_statistics, process_frames
from upsp_tpu.pipeline.phase2 import run_phase2
from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state
from upsp_tpu.ops.projection import coverage as proj_coverage


@pytest.fixture(scope="module")
def scene():
    state = make_synthetic_state(
        n_cameras=2, image_hw=(64, 96), grid_shape=(24, 20),
        n_patch_dots=3, registration="none",
    )
    # 8-cycle modulation over 64 frames: survives the degree-6 detrend, so
    # the delta-Cp signal sits far above f32 round-off
    ref = np.array(state.ref_frames)  # (C, H, W)
    F = 64
    s = 0.01 * np.sin(2 * np.pi * 8 * np.arange(F) / F)
    frames = np.stack([ref * (1.0 + s[f]) for f in range(F)]).astype(np.float32)
    return state, frames


class TestShardedPipeline:
    def test_matches_unsharded(self, scene):
        state, frames = scene
        cond = TunnelConditions(mach=0.8, qbar=144.0, ps=500.0, ttot=80.0)
        pcal = PaintCalibration(a=1.0, b=0.01)

        mesh = make_mesh()
        out = run_sharded(state, frames, cond, pcal, mesh=mesh)

        # unsharded oracle through the standard phases
        intensity = process_frames(state, jnp.asarray(frames))
        avg, _ = phase1_statistics(intensity)
        cov = proj_coverage(state.projections, *state.image_hw)
        cfg = state.config
        cfg.degree = 6
        p2 = run_phase2(
            cfg, jnp.asarray(np.asarray(intensity).T), avg, cov, cond, pcal
        )

        vis = np.array(state.projections[0].visible) | np.array(
            state.projections[1].visible
        )
        np.testing.assert_allclose(
            np.array(out.intensity)[:, vis],
            np.array(intensity)[:, vis],
            rtol=1e-5, atol=1e-2,
        )
        np.testing.assert_allclose(
            np.array(out.pressure_transpose)[vis],
            np.array(p2.pressure_transpose)[vis],
            rtol=5e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.array(out.rms)[vis], np.array(p2.rms)[vis], rtol=5e-3, atol=1e-5
        )

    def test_sharding_layout(self, scene):
        state, frames = scene
        cond = TunnelConditions(mach=0.8, qbar=144.0, ps=500.0, ttot=80.0)
        out = run_sharded(state, frames, cond, PaintCalibration(a=1.0))
        # intensity sharded over frames, pressure_transpose over nodes
        assert out.intensity.sharding.spec[0] == "frames"
        assert out.pressure_transpose.sharding.spec[0] == "frames"

    def test_frame_padding(self, scene):
        """Frame counts that don't divide the mesh still work."""
        state, frames = scene
        cond = TunnelConditions(mach=0.8, qbar=144.0, ps=500.0, ttot=80.0)
        out = run_sharded(state, frames[:13], cond, PaintCalibration(a=1.0))
        assert out.intensity.shape[0] == 16  # padded to 8-device multiple
