"""Block-local Pallas projection gather (ops/pallas_gather.py).

Interpret-mode kernels on CPU; the TPU lowering is exercised by
tools/bench_fullconfig.py and the production driver.  The contract under
test: slab-kernel output + host finalize == the plain combined gather +
NaN skip + overlap adjustment, bit-for-bit in semantics (same sources,
same weights, same overlay corrections).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upsp_tpu.ops.pallas_gather import (
    build_slab_gather,
    expand_overlay_slots,
    finalize_host,
    slab_gather_apply,
    slab_gather_reference,
)


class TestKernel:
    def _case(self, rng, C=2, H=23, W=150, N=3000, invis=0.3):
        idx = rng.integers(0, C * H * W, N)
        w = rng.random(N).astype(np.float32)
        w[rng.random(N) < invis] = 0.0
        sup = np.arange(N)
        sup[5], sup[100] = 17, 3  # superseded copies
        return idx, w, sup, (H, W), C

    def test_matches_reference_and_plain(self, rng):
        idx, w, sup, hw, C = self._case(rng)
        plan = build_slab_gather(idx, w, sup, hw, C)
        imgs = rng.normal(2000, 300, (3, C * hw[0] * hw[1])).astype(
            np.float32
        )
        out = np.asarray(slab_gather_apply(plan, jnp.asarray(imgs)))
        ref = np.asarray(slab_gather_reference(plan, jnp.asarray(imgs)))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-4)
        plain = imgs[:, idx[sup]] * w[sup][None]
        got = finalize_host(plan, out)
        np.testing.assert_allclose(got, plain, rtol=1e-6, atol=1e-4)

    def test_skip_mask_and_single_frame(self, rng):
        idx, w, sup, hw, C = self._case(rng, N=1000)
        plan = build_slab_gather(idx, w, sup, hw, C)
        img = rng.normal(2000, 300, C * hw[0] * hw[1]).astype(np.float32)
        out = np.asarray(slab_gather_apply(plan, jnp.asarray(img)))
        skip = rng.random(1000) < 0.2
        got = finalize_host(plan, out, skip)
        plain = img[idx[sup]] * w[sup]
        exp = np.where(skip, np.nan, plain)
        np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-4,
                                   equal_nan=True)

    def test_all_invisible_row(self, rng):
        """Zero-weight nodes resolve through the virtual zero slot."""
        idx, w, sup, hw, C = self._case(rng, N=500, invis=0.9)
        plan = build_slab_gather(idx, w, sup, hw, C)
        img = rng.normal(2000, 300, C * hw[0] * hw[1]).astype(np.float32)
        got = finalize_host(
            plan, np.asarray(slab_gather_apply(plan, jnp.asarray(img)))
        )
        plain = img[idx[sup]] * w[sup]
        np.testing.assert_allclose(got, plain, rtol=1e-6, atol=1e-4)

    def test_overlay_slot_expansion(self, rng):
        idx, w, sup, hw, C = self._case(rng)
        w[17] = 0.7  # ensure the superseded primary is visible
        plan = build_slab_gather(idx, w, sup, hw, C)
        ni = np.array([17, 200], np.int64)
        slots, sel = expand_overlay_slots(plan, ni, sup)
        # node 5 is superseded by 17, so 17's correction lands on the slots
        # of BOTH 17 and 5; node 200 only on its own
        assert (sel == 0).sum() == 2
        assert (sel == 1).sum() == 1
        assert set(slots.tolist()) == {
            int(plan.node_slot[5]), int(plan.node_slot[17]),
            int(plan.node_slot[200]),
        }


class TestChunkProcessorIntegration:
    def _setup(self, tmp_path):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_driver_mesh import _config, _frames

        from upsp_tpu.pipeline.phase0 import run_phase0

        shifts = [(0.0, 0.0), (0.4, -0.3), (-0.2, 0.5), (0.3, 0.2)]
        frames = _frames(4, shifts=shifts)
        cfg = _config(tmp_path, registration="pixel")
        state = run_phase0(cfg, [frames[0, 0]], [12])
        return state, frames

    def test_slab_mode_matches_plain_chunk(self, tmp_path, monkeypatch):
        """Forced slab mode == the plain path after host finalize (the
        production contract run_datapoint relies on)."""
        from upsp_tpu.ops.pallas_gather import finalize_host
        from upsp_tpu.pipeline.phase1 import make_chunk_processor

        state, frames = self._setup(tmp_path)
        plain = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, slab_gather=False,
            with_telemetry=True,
        )
        slab = make_chunk_processor(
            state, warm_start="fft", ecc_iters=2, slab_gather=True,
            with_telemetry=True,
        )
        assert getattr(slab, "slab_plan", None) is not None
        i_plain, t_plain = plain(jnp.asarray(frames))
        i_slab, t_slab = slab(jnp.asarray(frames))
        got = finalize_host(
            slab.slab_plan, np.asarray(i_slab), slab.skipped_eff
        )
        np.testing.assert_allclose(
            got, np.asarray(i_plain), rtol=1e-5, atol=1e-2, equal_nan=True
        )
        np.testing.assert_allclose(
            np.asarray(t_slab), np.asarray(t_plain), rtol=1e-5, atol=1e-4
        )

    def test_run_datapoint_slab_env(self, tmp_path, monkeypatch):
        """UPSP_SLAB_GATHER=1: the driver finalizes slot-order chunks and
        every output matches the plain run."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_driver_mesh import _config, _frames

        from upsp_tpu.pipeline.run import run_datapoint

        frames = _frames(6)
        ref = run_datapoint(
            _config(tmp_path, out="plain"), frames_array=frames,
            write_outputs=False,
        )
        monkeypatch.setenv("UPSP_SLAB_GATHER", "1")
        out = run_datapoint(
            _config(tmp_path, out="slab"), frames_array=frames,
            write_outputs=False,
        )
        np.testing.assert_allclose(
            out.intensity, ref.intensity, rtol=1e-5, atol=1e-2,
            equal_nan=True,
        )
        dcp_a = np.asarray(out.phase2.pressure_transpose)
        dcp_b = np.asarray(ref.phase2.pressure_transpose)
        fin = np.isfinite(dcp_b)
        np.testing.assert_allclose(
            dcp_a[fin], dcp_b[fin], rtol=1e-4, atol=1e-2
        )


@pytest.fixture
def rng():
    return np.random.default_rng(17)
