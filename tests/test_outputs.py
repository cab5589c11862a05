"""Flat-file / HDF5 output tests + a full run_datapoint integration pass."""

import json

import numpy as np
import pytest

from upsp_tpu.io.flatfile import (
    FlatFileSet,
    read_flat,
    read_node_history,
    read_vv,
    vv_subsample,
    write_flat,
    write_vv,
)


class TestFlatFiles:
    def test_roundtrip(self, tmp_path, rng):
        data = rng.normal(size=256).astype(np.float32)
        p = str(tmp_path / "avg")
        write_flat(p, data)
        np.testing.assert_array_equal(read_flat(p), data)

    def test_offset_write(self, tmp_path):
        p = str(tmp_path / "blk")
        write_flat(p, np.zeros(16, np.float32))
        write_flat(p, np.ones(4, np.float32), offset_values=8)
        out = read_flat(p)
        assert out[:8].sum() == 0 and (out[8:12] == 1).all()

    def test_node_history(self, tmp_path, rng):
        n_nodes, n_frames = 6, 32
        data = rng.normal(size=(n_nodes, n_frames)).astype(np.float32)
        p = str(tmp_path / "pressure_transpose")
        write_flat(p, data)
        np.testing.assert_array_equal(
            read_node_history(p, 3, n_frames), data[3]
        )

    def test_vv_subsample(self):
        v = np.arange(5000, dtype=np.float32)
        out = vv_subsample(v)
        assert out.size == 1000
        assert out[0] == 0 and out[1] == 5  # stride = 5000 // 1000

    def test_vv_small_input(self, tmp_path):
        v = np.arange(10, dtype=np.float32)
        p = str(tmp_path / "vv.dat")
        write_vv(p, v)
        np.testing.assert_array_equal(read_vv(p), v)


class TestHDF5:
    def test_writer_roundtrip(self, tmp_path, rng):
        h5py = pytest.importorskip("h5py")
        from upsp_tpu.io.hdf5io import (
            PSPWriter,
            hdf5_is_structured,
            hdf5_is_transposed,
            hdf5_num_frames,
            hdf5_num_nodes,
            hdf5_read_dataset,
            hdf5_read_node_history,
        )
        from upsp_tpu.io.wtd import TunnelConditions
        from upsp_tpu.pipeline.synthetic import make_plate_grid
        from upsp_tpu.geometry.grids import from_struct_grid

        model = from_struct_grid(make_plate_grid(8, 6))
        n, f = model.size, 16
        frames = rng.normal(size=(n, f)).astype(np.float32)
        cond = TunnelConditions(mach=0.85, qbar=144.0, ps=500.0, ttot=80.0,
                                alpha=1.0, beta=0.1, phi=0.0)
        cond.test_id = "t11"
        cond.run = 3
        path = str(tmp_path / "out.h5")
        with PSPWriter(path, model, n_frames=f, transposed=True) as w:
            w.write_grid("in")
            w.write_tunnel_conditions(cond)
            w.write_camera_settings(framerate=10000, fstop=2.8, exposure=30.0,
                                    focal_lengths=[900.0])
            w.write_frames_block(frames)
            w.write_new_dataset("rms", frames.std(axis=1), "delta Cp")
            w.write_string_attribute("code_version", "upsp_tpu-0.1")

        assert hdf5_num_frames(path) == f
        assert hdf5_num_nodes(path) == n
        assert hdf5_is_transposed(path)
        assert hdf5_is_structured(path)
        np.testing.assert_allclose(hdf5_read_node_history(path, 5), frames[5])
        np.testing.assert_allclose(
            hdf5_read_dataset(path, "Condition/mach"), 0.85
        )

    def test_frame_major_layout(self, tmp_path, rng):
        """transposed=False writes the reference's (frames, nodes) layout
        (PSPHDF5.h:314-343, transpose attr 0); interrogation API adapts."""
        h5py = pytest.importorskip("h5py")
        from upsp_tpu.geometry.grids import from_struct_grid
        from upsp_tpu.io.hdf5io import (
            PSPWriter,
            hdf5_is_transposed,
            hdf5_num_frames,
            hdf5_read_node_history,
        )
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        model = from_struct_grid(make_plate_grid(8, 6))
        n, f = model.size, 16
        frames = rng.normal(size=(n, f)).astype(np.float32)
        path = str(tmp_path / "fm.h5")
        with PSPWriter(path, model, n_frames=f, transposed=False) as w:
            w.write_grid("in")
            # two node-major blocks at offsets, transposed on the fly
            w.write_frames_block(frames[: n // 2])
            w.write_frames_block(frames[n // 2 :], node_start=n // 2)
        assert not hdf5_is_transposed(path)
        assert hdf5_num_frames(path) == f
        with h5py.File(path) as h:
            assert h["frames"].shape == (f, n)
            np.testing.assert_allclose(h["frames"][:], frames.T)
        np.testing.assert_allclose(hdf5_read_node_history(path, 5), frames[5])


class TestRunDatapoint:
    def test_full_run_synthetic(self, tmp_path, rng):
        """Integration: config-driven run with a frames array, all outputs."""
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.run import run_datapoint
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        grid = make_plate_grid(21, 17)
        grid_path = str(tmp_path / "plate.grid")
        write_p3d_grid(grid_path, grid)
        cam_path = str(tmp_path / "cam.json")
        with open(cam_path, "w") as fh:
            json.dump(
                {
                    "uPSP_cameraMatrix": [[200.0, 0, 0], [0, 200.0, 0], [0, 0, 1]],
                    "distCoeffs": [[0, 0, 0, 0, 0]],
                    "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "tvec": [-5.0, 4.0, 20.0],
                },
                fh,
            )
        wtd_path = str(tmp_path / "t.wtd")
        with open(wtd_path, "w") as fh:
            fh.write("RUN 1 1\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n")
            fh.write("0.80\t0.00\t0.00\t0.00\t144.00\t500.00\t80.00\t0.00\n")
        paint_path = str(tmp_path / "paint.cal")
        with open(paint_path, "w") as fh:
            fh.write("a = 1.0\nb = 0.0\nc = 0\nd = 0\ne = 0\nf = 0\n")

        cfg = ProcessingConfig(
            test_id="synth",
            run=1,
            sequence=1,
            cameras=[CameraInputs(number=1, calibration=cam_path)],
            grid=grid_path,
            sds=wtd_path,
            paint_cal=paint_path,
            registration="none",
            target_patcher="none",
            out_dir=str(tmp_path / "out"),
        )
        H, W, F = 96, 128, 12
        yy, xx = np.mgrid[0:H, 0:W]
        base = (2000 + 5.0 * xx + 3.0 * yy).astype(np.float32)
        frames = np.stack(
            [base[None] * (1 + 0.01 * np.sin(2 * np.pi * f / 7)) for f in range(F)]
        )
        out = run_datapoint(cfg, frames_array=frames)
        assert out.n_frames == F
        assert out.phase2 is not None
        vis = np.array(out.state.projections[0].visible)
        assert vis.sum() > 200
        dcp = np.asarray(out.phase2.pressure_transpose)
        assert np.isfinite(dcp[vis]).all()
        # files on disk
        assert (tmp_path / "out" / "pressure_transpose").exists()
        assert (tmp_path / "out" / "X").exists()
        assert (tmp_path / "out" / "vv-cp-rms.dat").exists()
        assert (tmp_path / "out" / "output.h5").exists()

    def test_checkout_mode(self, tmp_path, rng):
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.run import run_datapoint
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        grid_path = str(tmp_path / "g.grid")
        write_p3d_grid(grid_path, make_plate_grid(11, 9))
        cam_path = str(tmp_path / "cam.json")
        with open(cam_path, "w") as fh:
            json.dump(
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
            grid=grid_path,
            registration="none",
            target_patcher="none",
        )
        frames = np.full((3, 1, 64, 96), 2000, np.float32)
        out = run_datapoint(cfg, checkout=True, frames_array=frames)
        assert out.intensity is None
        assert out.state.n_nodes == 99


class TestResumeAndDeterminism:
    def _setup(self, tmp_path):
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        grid_path = str(tmp_path / "g.grid")
        write_p3d_grid(grid_path, make_plate_grid(21, 17))
        cam_path = str(tmp_path / "cam.json")
        with open(cam_path, "w") as fh:
            json.dump(
                {
                    "uPSP_cameraMatrix": [[200.0, 0, 0], [0, 200.0, 0], [0, 0, 1]],
                    "distCoeffs": [[0, 0, 0, 0, 0]],
                    "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "tvec": [-5.0, 4.0, 20.0],
                },
                fh,
            )
        wtd_path = str(tmp_path / "t.wtd")
        with open(wtd_path, "w") as fh:
            fh.write("RUN 1 1\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n")
            fh.write("0.80\t0.00\t0.00\t0.00\t144.00\t500.00\t80.00\t0.00\n")
        paint_path = str(tmp_path / "paint.cal")
        with open(paint_path, "w") as fh:
            fh.write("a = 1.0\nb = 0.0\nc = 0\nd = 0\ne = 0\nf = 0\n")
        cfg = ProcessingConfig(
            test_id="synth", run=1, sequence=1,
            cameras=[CameraInputs(number=1, calibration=cam_path)],
            grid=grid_path, sds=wtd_path, paint_cal=paint_path,
            registration="none", target_patcher="none",
            out_dir=str(tmp_path / "out"),
        )
        H, W, F = 64, 96, 16
        yy, xx = np.mgrid[0:H, 0:W]
        base = (2000 + 5.0 * xx + 3.0 * yy).astype(np.float32)
        frames = np.stack(
            [base[None] * (1 + 0.01 * np.sin(2 * np.pi * 5 * f / F))
             for f in range(F)]
        )
        return cfg, frames

    def test_resume_skips_phase1(self, tmp_path):
        from upsp_tpu.pipeline.run import run_datapoint

        cfg, frames = self._setup(tmp_path)
        out1 = run_datapoint(cfg, frames_array=frames)
        # resume run: phase1 intensity reloaded from disk, results identical
        out2 = run_datapoint(cfg, frames_array=frames, resume=True)
        np.testing.assert_array_equal(out2.intensity, out1.intensity)
        np.testing.assert_array_equal(
            np.array(out2.phase2.pressure_transpose),
            np.array(out1.phase2.pressure_transpose),
        )

    def test_vv_dumps_deterministic(self, tmp_path):
        """Two identical runs produce bit-identical vv regression dumps."""
        from upsp_tpu.io.flatfile import read_vv
        from upsp_tpu.pipeline.run import run_datapoint

        cfg, frames = self._setup(tmp_path)
        run_datapoint(cfg, frames_array=frames)
        vv1 = {
            n: read_vv(str(tmp_path / "out" / n))
            for n in ("vv-int-avg.dat", "vv-int-rms.dat", "vv-cp-rms.dat")
        }
        run_datapoint(cfg, frames_array=frames)
        for n, v in vv1.items():
            np.testing.assert_array_equal(
                read_vv(str(tmp_path / "out" / n)), v
            )

    def test_streaming_matches_in_memory(self, tmp_path):
        """Out-of-core streaming run == in-memory run (per-node outputs)."""
        from upsp_tpu import native
        from upsp_tpu.pipeline.run import run_datapoint, run_datapoint_streaming
        from upsp_tpu.io.flatfile import read_flat

        cfg, frames = self._setup(tmp_path)
        ref = run_datapoint(cfg, frames_array=frames)

        import dataclasses as dc
        cfg2 = dc.replace(cfg, out_dir=str(tmp_path / "out_stream"))
        out = run_datapoint_streaming(cfg2, frames_array=frames,
                                      frames_per_chunk=5, node_block=64)
        np.testing.assert_allclose(
            out.intensity_avg, ref.intensity_avg, rtol=1e-5, atol=1e-3,
            equal_nan=True,
        )
        np.testing.assert_allclose(
            np.array(out.phase2.rms), np.array(ref.phase2.rms),
            rtol=1e-4, atol=1e-6, equal_nan=True,
        )
        # on-disk pressure_transpose matches the in-memory one
        n, f = ref.intensity.shape[1], ref.intensity.shape[0]
        disk = read_flat(str(tmp_path / "out_stream" / "pressure_transpose"))
        mem = np.array(ref.phase2.pressure_transpose).ravel()
        ok = np.isfinite(mem)
        np.testing.assert_allclose(disk[ok], mem[ok], rtol=1e-4, atol=1e-6)
        # incremental HDF5 written per node block matches too
        h5py = pytest.importorskip("h5py")
        with h5py.File(str(tmp_path / "out_stream" / "output.h5"), "r") as fh:
            h5frames = fh["frames"][...]
            assert h5frames.shape == (n, f)
            np.testing.assert_allclose(
                h5frames.ravel()[ok], mem[ok], rtol=1e-4, atol=1e-6
            )
            assert "rms" in fh and "average" in fh and "coverage" in fh

    def test_streaming_callable_source_matches_array(self, tmp_path):
        """A device-resident frame source yields the same outputs as the
        equivalent in-memory array (the endurance benchmark's ingest mode)."""
        import dataclasses as dc

        import jax.numpy as jnp

        from upsp_tpu.io.flatfile import read_flat
        from upsp_tpu.pipeline.run import run_datapoint_streaming

        cfg, frames = self._setup(tmp_path)
        cfg_a = dc.replace(cfg, out_dir=str(tmp_path / "out_a"))
        ref = run_datapoint_streaming(
            cfg_a, frames_array=frames, frames_per_chunk=5, node_block=64,
            write_hdf5=False,
        )

        dev = jnp.asarray(frames)

        def source(start, count):
            return dev[start : start + count]

        cfg_b = dc.replace(
            cfg, out_dir=str(tmp_path / "out_b"), frames=frames.shape[0]
        )
        out = run_datapoint_streaming(
            cfg_b, frames_array=source, frames_per_chunk=5, node_block=64,
            write_hdf5=False,
        )
        np.testing.assert_array_equal(
            out.intensity_avg, ref.intensity_avg
        )
        np.testing.assert_array_equal(
            np.array(out.phase2.rms), np.array(ref.phase2.rms)
        )
        np.testing.assert_array_equal(
            read_flat(str(tmp_path / "out_b" / "pressure_transpose")),
            read_flat(str(tmp_path / "out_a" / "pressure_transpose")),
        )


class TestRegistrationTelemetry:
    def test_run_writes_registration_file(self, tmp_path):
        """run_datapoint(registration_telemetry=True) -> flat file + sane values."""
        import jax.numpy as jnp  # noqa: F401

        from upsp_tpu.io.flatfile import read_flat
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.run import run_datapoint
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        grid = make_plate_grid(21, 17)
        grid_path = str(tmp_path / "plate.grid")
        write_p3d_grid(grid_path, grid)
        cam_path = str(tmp_path / "cam.json")
        with open(cam_path, "w") as fh:
            json.dump(
                {
                    "uPSP_cameraMatrix": [[200.0, 0, 0], [0, 200.0, 0], [0, 0, 1]],
                    "distCoeffs": [[0, 0, 0, 0, 0]],
                    "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "tvec": [-5.0, 4.0, 20.0],
                },
                fh,
            )
        cfg = ProcessingConfig(
            test_id="synth", run=1, sequence=1,
            cameras=[CameraInputs(number=1, calibration=cam_path)],
            grid=grid_path,
            registration="pixel",
            target_patcher="none",
            out_dir=str(tmp_path / "out"),
        )
        H, W, F = 96, 128, 4
        yy, xx = np.mgrid[0:H, 0:W]
        base = (
            2000
            + 400 * np.exp(-((xx - 60) ** 2 + (yy - 50) ** 2) / 400.0)
            + 100 * np.sin(xx / 5.0) * np.cos(yy / 7.0)
        ).astype(np.float32)
        frames = np.stack(
            [np.roll(base, (f % 2, -(f % 2)), axis=(0, 1))[None] for f in range(F)]
        )
        out = run_datapoint(cfg, frames_array=frames, registration_telemetry=True)
        assert out.n_frames == F
        tele = read_flat(str(tmp_path / "out" / "registration")).reshape(F, 1, 5)
        assert (tele[:, :, 0] > 0.8).all()
        # default mode is fft/unrolled: column 1 is the final |drho| of the
        # last GN step — the convergence certificate (the step count is a
        # compile-time constant there).  The sidecar records the contract.
        from upsp_tpu.pipeline.diagnostics import (
            analyze_registration_telemetry,
            read_registration_meta,
        )

        meta = read_registration_meta(str(tmp_path / "out" / "registration"))
        assert meta["conv_semantics"] == "drho"
        # residuals, not counts: small non-negative values, exactly 0 for the
        # even frames (identical to the reference frame -> converged at once)
        assert (tele[:, :, 1] >= 0).all()
        assert (tele[:, :, 1] < 0.05).all()
        assert (tele[::2, :, 1] == 0).all()
        assert np.abs(tele[1:, :, 2:]).max() > 0.3  # rolled frames -> shift seen
        # the analyzer consumes the recorded semantics without guessing: the
        # rolled frames end above epsilon after 2 GN steps on this tiny
        # synthetic, so it recommends one more unrolled step
        rep = analyze_registration_telemetry(
            tele, conv_semantics=meta["conv_semantics"], epsilon=meta["epsilon"]
        )
        cam = rep["cameras"][0]
        assert cam["conv_semantics"] == "drho"
        assert cam["unconverged_frac"] == pytest.approx(
            float((tele[:, :, 1] >= meta["epsilon"]).mean())
        )
        assert cam["drho_max"] == pytest.approx(float(tele[:, :, 1].max()))


class TestPackedIngestConfig:
    def test_uniform_format_gating(self):
        from types import SimpleNamespace

        from upsp_tpu.pipeline.run import _packed_ingest_config

        lut = np.arange(1024, dtype=np.uint16)
        r12 = SimpleNamespace(supports_packed_reads=True, packed_bits=12, packed_lut=None)
        r10 = SimpleNamespace(supports_packed_reads=True, packed_bits=10, packed_lut=lut)
        r10b = SimpleNamespace(supports_packed_reads=True, packed_bits=10, packed_lut=lut.copy())
        r_no = SimpleNamespace(supports_packed_reads=False)

        ok, kw = _packed_ingest_config([r12, r12], None, "auto")
        assert ok and kw == {"packed_bits": 12, "lut": None}
        ok, kw = _packed_ingest_config([r10, r10b], None, "auto")
        assert ok and kw["packed_bits"] == 10
        # mixed bit depths, missing support, disabled, frames_array -> host path
        assert not _packed_ingest_config([r12, r10], None, "auto")[0]
        assert not _packed_ingest_config([r12, r_no], None, "auto")[0]
        assert not _packed_ingest_config([r12], None, False)[0]
        assert not _packed_ingest_config([r12], np.zeros((1, 1, 4, 4)), "auto")[0]


class TestPackedRunEndToEnd:
    def test_mraw_packed_vs_host_decode(self, tmp_path):
        """run_datapoint from a real .mraw: device_unpack == host decode."""
        from upsp_tpu.io.plot3d import write_p3d_grid
        from upsp_tpu.io.video.util import pack_12bpp
        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.run import run_datapoint
        from upsp_tpu.pipeline.synthetic import make_plate_grid

        grid_path = str(tmp_path / "plate.grid")
        write_p3d_grid(grid_path, make_plate_grid(21, 17))
        cam_json = str(tmp_path / "cam.json")
        with open(cam_json, "w") as fh:
            json.dump(
                {
                    "uPSP_cameraMatrix": [[200.0, 0, 0], [0, 200.0, 0], [0, 0, 1]],
                    "distCoeffs": [[0, 0, 0, 0, 0]],
                    "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                    "tvec": [-5.0, 4.0, 20.0],
                },
                fh,
            )
        # 12-bit packed mraw + cih sidecar
        H, W, F = 96, 128, 6
        yy, xx = np.mgrid[0:H, 0:W]
        base = 2000 + 5.0 * xx + 3.0 * yy
        frames = np.stack(
            [
                np.clip(
                    np.round(base * (1 + 0.01 * np.sin(2 * np.pi * f / 5))), 0, 4095
                ).astype(np.uint16)
                for f in range(F)
            ]
        )
        with open(tmp_path / "video.mraw", "wb") as fh:
            for f in range(F):
                fh.write(pack_12bpp(frames[f].reshape(-1)).tobytes())
        (tmp_path / "video.cih").write_text(
            "#\n"
            f"Image Width : {W}\n"
            f"Image Height : {H}\n"
            "Color Bit : 12\n"
            "Record Rate(fps) : 10000\n"
            f"Total Frame : {F}\n"
            "END\n"
        )
        cfg = ProcessingConfig(
            cameras=[
                CameraInputs(
                    number=1, video=str(tmp_path / "video.mraw"),
                    calibration=cam_json,
                )
            ],
            grid=grid_path,
            registration="none",
            target_patcher="none",
        )
        out_p = run_datapoint(
            cfg, frames_per_chunk=4, write_outputs=False, device_unpack=True
        )
        out_h = run_datapoint(
            cfg, frames_per_chunk=4, write_outputs=False, device_unpack=False
        )
        assert out_p.n_frames == F
        np.testing.assert_array_equal(out_p.intensity, out_h.intensity)
        # and against the direct frames_array path
        out_a = run_datapoint(
            cfg, frames_array=frames[:, None].astype(np.float32),
            write_outputs=False,
        )
        np.testing.assert_allclose(
            out_p.intensity, out_a.intensity, rtol=1e-6, atol=1e-4
        )
