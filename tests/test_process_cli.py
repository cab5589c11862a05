"""upsp-process CLI parity with the reference psp_process surface.

The reference takes paint_cal / h5_out / steady_p3d / cutoff_x_max / bound_pts
etc. as command-line flags layered over the input deck
(psp_process.cpp:1193-1218) and refuses to start without -paint_cal
(:1240-1243).  These tests drive the installed script end to end from a real
synthesized .mraw datapoint.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = "/root/repo"


def run_cli(args, timeout=300):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", args[0])] + args[1:],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


@pytest.fixture(scope="module")
def datapoint(tmp_path_factory):
    """12-bit .mraw + .cih + grid + camera + wtd + paint cal + deck."""
    from upsp_tpu.io.plot3d import write_p3d_grid
    from upsp_tpu.io.video.util import pack_12bpp
    from upsp_tpu.pipeline.synthetic import make_plate_grid

    root = tmp_path_factory.mktemp("dp")
    write_p3d_grid(str(root / "plate.grid"), make_plate_grid(21, 17))
    with open(root / "cam.json", "w") as fh:
        json.dump(
            {
                "uPSP_cameraMatrix": [[200.0, 0, 0], [0, 200.0, 0], [0, 0, 1]],
                "distCoeffs": [[0, 0, 0, 0, 0]],
                "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                "tvec": [-5.0, 4.0, 20.0],
            },
            fh,
        )
    with open(root / "t.wtd", "w") as fh:
        fh.write("RUN 1 1\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n")
        fh.write("0.80\t0.00\t0.00\t0.00\t144.00\t500.00\t80.00\t0.00\n")
    with open(root / "paint.cal", "w") as fh:
        fh.write("a = 1.0\nb = 0.0\nc = 0\nd = 0\ne = 0\nf = 0\n")

    F, H, W = 12, 64, 96
    yy, xx = np.mgrid[0:H, 0:W]
    frames = np.empty((F, H, W), np.uint16)
    for f in range(F):
        img = 2000 + 5.0 * xx + 3.0 * yy
        frames[f] = np.clip(
            img * (1 + 0.01 * np.sin(2 * np.pi * f / 7)), 0, 4095
        ).astype(np.uint16)
    with open(root / "cam01.mraw", "wb") as fh:
        fh.write(pack_12bpp(frames.reshape(F, -1)).tobytes())
    with open(root / "cam01.cih", "w") as fh:
        fh.write(
            "Record Rate(fps) : 10000\nShutter Speed(s) : 1/20000\n"
            f"Total Frame : {F}\nImage Width : {W}\nImage Height : {H}\n"
            "Color Bit : 12\nEffectiveBit Depth : 12\n"
            "EffectiveBit Side : Lower\nFile Format : Mraw\n"
        )
    # deck deliberately omits paint_cal + h5_out: they arrive via CLI flags,
    # the reference's split (deck = files/options, CLI = phase-2 files)
    with open(root / "deck.inp", "w") as fh:
        fh.write(
            "@general\n\ttest = synth\n\trun = 1\n\tsequence = 1\n"
            f"@vars\n\tdir = {root}\n"
            "@all\n\tsds = $dir/t.wtd\n\tgrid = $dir/plate.grid\n"
            "@camera\n\tnumber = 1\n\tcine = $dir/cam01.mraw\n"
            "\tcalibration = $dir/cam.json\n"
            "@options\n\ttarget_patcher = none\n\tregistration = none\n"
            f"\tfilter = none\n\tnumber_frames = {F}\n"
            "@output\n\tdir = $dir/out\n"
        )
    return root


class TestReferenceCLISurface:
    def test_missing_paint_cal_is_loud(self, datapoint):
        r = run_cli(["upsp-process", "-input_deck", str(datapoint / "deck.inp")])
        assert r.returncode != 0
        assert "paint_cal" in r.stderr

    def test_paint_cal_and_h5_out_flags(self, datapoint, tmp_path):
        h5 = str(tmp_path / "custom.h5")
        r = run_cli(
            [
                "upsp-process",
                "-input_deck", str(datapoint / "deck.inp"),
                "-paint_cal", str(datapoint / "paint.cal"),
                "-h5_out", h5,
                "-add_out_dir", str(tmp_path / "extras"),
            ]
        )
        assert r.returncode == 0, r.stderr
        from upsp_tpu.io.flatfile import FLAT_FILES

        out = datapoint / "out"
        missing = [n for n in FLAT_FILES if not (out / n).exists()]
        assert not missing, missing
        assert os.path.exists(h5)  # -h5_out overrides <out_dir>/output.h5
        assert not (out / "output.h5").exists()
        # diagnostics rerouted to -add_out_dir (psp_process.cpp:1261)
        extras = os.listdir(tmp_path / "extras")
        assert any("8bit-raw" in n for n in extras)
        assert not any(
            n.startswith("cam01-8bit") for n in os.listdir(out)
        )

    def test_deck_paint_cal_alias(self, datapoint, tmp_path):
        """'paint_cal =' in the deck itself is accepted too."""
        deck = (datapoint / "deck.inp").read_text()
        deck = deck.replace(
            "@all\n", f"@all\n\tpaint_cal = {datapoint}/paint.cal\n"
        ).replace("\tdir = $dir/out\n", f"\tdir = {tmp_path}/out2\n")
        alt = tmp_path / "deck2.inp"
        alt.write_text(deck)
        r = run_cli(["upsp-process", "-input_deck", str(alt)])
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "out2" / "gain").exists()

    def test_cutoff_and_patch_flag_overrides(self, datapoint):
        from upsp_tpu.pipeline.config import read_input_deck

        cfg = read_input_deck(str(datapoint / "deck.inp"))
        assert cfg.bound_thickness == 2 and cfg.buffer_thickness == 1
        assert cfg.target_diam_sf == pytest.approx(1.2)

    def test_streaming_without_paint_cal_raises(self, datapoint):
        from upsp_tpu.pipeline.config import read_input_deck
        from upsp_tpu.pipeline.run import run_datapoint_streaming

        cfg = read_input_deck(str(datapoint / "deck.inp"))
        with pytest.raises(ValueError, match="paint"):
            run_datapoint_streaming(cfg)


class TestPhase2SkipWarning:
    def test_library_warns_not_silently_skips(self, datapoint, caplog):
        import logging

        from upsp_tpu.pipeline.config import read_input_deck
        from upsp_tpu.pipeline.run import run_datapoint

        cfg = read_input_deck(str(datapoint / "deck.inp"))
        cfg.out_dir = ""
        with caplog.at_level(logging.WARNING, logger="upsp_tpu"):
            out = run_datapoint(cfg, write_outputs=False)
        assert out.phase2 is None
        assert any("phase 2 skipped" in r.message for r in caplog.records)
