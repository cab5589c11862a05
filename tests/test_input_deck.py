"""Input-deck parser fidelity vs the documented reference format."""

import pytest

from upsp_tpu.pipeline.config import read_input_deck

DECK = """\
@general
\ttest = t11-0344
\trun = 1312
\tsequence = 01
\ttunnel = ames_unitary
@vars
\tdir = /data/test_number
@all
\tsds = $dir/inputs/131201.wtd
\tgrid = $dir/inputs/config28.grid
\ttargets = $dir/inputs/config28.tgts
\tnormals = $dir/inputs/config28_normals.csv
@camera
\tnumber = 1
\tcine = $dir/inputs/13120101.cine
\tcalibration = $dir/inputs/cam01-to-model.json
\taedc = false
@camera
\tnumber = 2
\tfilename = $dir/inputs/13120102.mraw
  calibration = $dir/inputs/cam02-to-model.json
@options
\ttarget_patcher = polynomial
\tregistration = pixel
\toverlap = best_view
\tfilter = gaussian
\tfilter_size = 3
\toblique_angle = 70
\tnumber_frames = 2000
@output
\tdir = $dir/outputs
"""


def test_documented_deck_parses(tmp_path):
    deck = tmp_path / "d.inp"
    deck.write_text(DECK)
    cfg = read_input_deck(str(deck))
    assert cfg.test_id == "t11-0344"
    assert cfg.run == 1312 and cfg.sequence == 1
    assert cfg.tunnel == "ames_unitary"
    assert cfg.sds == "/data/test_number/inputs/131201.wtd"
    assert cfg.grid.endswith("config28.grid")
    assert cfg.normals.endswith("config28_normals.csv")
    assert len(cfg.cameras) == 2
    assert cfg.cameras[0].number == 1
    assert cfg.cameras[0].video.endswith("13120101.cine")
    assert cfg.cameras[1].video.endswith("13120102.mraw")
    assert cfg.cameras[1].calibration.endswith("cam02-to-model.json")
    # @all targets propagated to both cameras
    assert cfg.cameras[0].targets.endswith("config28.tgts")
    assert cfg.cameras[1].targets.endswith("config28.tgts")
    assert cfg.target_patcher == "polynomial"
    assert cfg.registration == "pixel"
    assert cfg.overlap == "best_view"
    assert cfg.filter == "gaussian" and cfg.filter_size == 3
    assert cfg.oblique_angle == 70.0
    assert cfg.frames == 2000  # number_frames option drives the frame count
    assert cfg.out_dir == "/data/test_number/outputs"
