"""Full-scale end-to-end on the real fixture: fml grid (309k nodes) + camera01.

The closest single-host analog of the reference's production workload:
phase 0 (native BVH over 609k tris, projection visibility for all nodes,
fiducial patching from the tgts file) + phase 1 on real wind-tunnel imagery +
phase 2 conversion.
"""

import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp


@pytest.fixture(scope="module")
def fixture_run(ref_data, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    img = cv2.imread(
        str(ref_data / "images" / "CAM1_RUN8_CINE02_Y20000209H11294501.00001.png"),
        cv2.IMREAD_GRAYSCALE + cv2.IMREAD_ANYDEPTH,
    ).astype(np.float32)
    # promote the 8-bit PNG to a 12-bit-ish intensity scale
    img = img * 16.0

    wtd = tmp / "run.wtd"
    wtd.write_text(
        "RUN 8 2\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n"
        "0.85\t0.05\t0.12\t0.90\t350.00\t600.00\t85.00\t10.00\n"
    )
    paint = tmp / "paint.cal"
    paint.write_text("a = 0.2\nb = 0.004\nc = 0\nd = 0.0005\ne = 0\nf = 0\n")

    from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig

    cfg = ProcessingConfig(
        test_id="fml_tc3",
        run=8,
        sequence=2,
        cameras=[
            CameraInputs(
                number=1,
                calibration=str(
                    ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"
                ),
                targets=str(ref_data / "fml_tc3_volume.tgts"),
            )
        ],
        grid=str(ref_data / "fml_tc3_volume.grid"),
        sds=str(wtd),
        paint_cal=str(paint),
        grid_tol=0.388202,
        registration="pixel",
        filter="gaussian",
        filter_size=3,
        out_dir=str(tmp / "out"),
    )

    # 8 frames: the real image with small brightness modulation + jitter
    F = 8
    rng = np.random.default_rng(5)
    frames = np.empty((F, 1) + img.shape, np.float32)
    for f in range(F):
        shift = rng.integers(-1, 2, 2)
        frames[f, 0] = np.roll(img, tuple(shift), axis=(0, 1)) * (
            1.0 + 0.008 * np.sin(2 * np.pi * 3 * f / F)
        )

    from upsp_tpu.pipeline.run import run_datapoint

    t0 = time.time()
    out = run_datapoint(cfg, frames_array=frames)
    wall = time.time() - t0
    return {"out": out, "wall": wall, "tmp": tmp}


class TestFixtureEndToEnd:
    def test_phase0_projection_coverage(self, fixture_run):
        out = fixture_run["out"]
        vis = np.array(out.state.projections[0].visible)
        # roughly the camera-facing half of the model projects
        assert 0.10 < vis.mean() < 0.95
        assert vis.sum() > 30_000

    def test_patcher_covers_targets(self, fixture_run):
        op = fixture_run["out"].state.patch_ops[0]
        assert op is not None
        assert op.n_clusters >= 5  # many sharpie dots visible

    def test_intensity_sane(self, fixture_run):
        out = fixture_run["out"]
        vis = np.array(out.state.projections[0].visible)
        inten = out.intensity[:, vis]
        assert np.isfinite(inten).all()
        assert inten.mean() > 100  # lit surface

    def test_phase2_outputs(self, fixture_run):
        out = fixture_run["out"]
        vis = np.array(out.state.projections[0].visible)
        dcp = np.asarray(out.phase2.pressure_transpose)
        assert np.isfinite(dcp[vis]).all()
        rms = np.asarray(out.phase2.rms)
        assert np.isfinite(rms[vis]).all()
        # files exist
        tmp = fixture_run["tmp"]
        assert (tmp / "out" / "pressure_transpose").exists()
        assert (tmp / "out" / "output.h5").exists()

    def test_wall_time_reasonable(self, fixture_run):
        # 309k nodes, 609k tris, 1 MP, 8 frames, full phase 0+1+2 on 2 CPUs
        assert fixture_run["wall"] < 600, f"took {fixture_run['wall']:.0f}s"


class TestTwoCameraFixture:
    def test_multicam_bestview(self, ref_data, tmp_path):
        """Two real cameras: BestView weighting must split the surface."""
        import cv2 as _cv2

        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.phase0 import run_phase0

        imgs = []
        for name in (
            "CAM1_RUN8_CINE02_Y20000209H11294501.00001.png",
            "CAM5_RUN8_CINE02_Y20220209H11291505.00001.png",
        ):
            img = _cv2.imread(
                str(ref_data / "images" / name),
                _cv2.IMREAD_GRAYSCALE + _cv2.IMREAD_ANYDEPTH,
            ).astype(np.float32) * 16.0
            imgs.append(img)

        cfg = ProcessingConfig(
            cameras=[
                CameraInputs(
                    number=1,
                    calibration=str(
                        ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"
                    ),
                    targets=str(ref_data / "fml_tc3_volume.tgts"),
                ),
                CameraInputs(
                    number=5,
                    calibration=str(
                        ref_data / "camera-tunnel-calibration" / "camera05_35_6.json"
                    ),
                    targets=str(ref_data / "fml_tc3_volume.tgts"),
                ),
            ],
            grid=str(ref_data / "fml_tc3_volume.grid"),
            grid_tol=0.388202,
            overlap="best_view",
            registration="none",
            target_patcher="polynomial",
        )
        state = run_phase0(cfg, imgs)
        v1 = np.array(state.projections[0].visible)
        v2 = np.array(state.projections[1].visible)
        w1 = np.array(state.projections[0].weight)
        w2 = np.array(state.projections[1].weight)
        both = v1 & v2
        assert both.sum() > 1000  # cameras overlap on part of the surface
        # BestView: overlap nodes belong to exactly one camera
        np.testing.assert_allclose(w1[both] + w2[both], 1.0, atol=1e-6)
        assert (w1[both] * w2[both] == 0).all()
        assert 0.05 < w1[both].mean() < 0.95  # both cameras win somewhere
        # union coverage beats either camera alone
        skipped = np.array(state.skipped)
        assert (~skipped).sum() >= max(v1.sum(), v2.sum())

    def test_multicam_average_views(self, ref_data, tmp_path):
        import dataclasses as dc

        import cv2 as _cv2

        from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
        from upsp_tpu.pipeline.phase0 import run_phase0

        img = _cv2.imread(
            str(ref_data / "images" / "CAM1_RUN8_CINE02_Y20000209H11294501.00001.png"),
            _cv2.IMREAD_GRAYSCALE + _cv2.IMREAD_ANYDEPTH,
        ).astype(np.float32) * 16.0
        cfg = ProcessingConfig(
            cameras=[
                CameraInputs(
                    number=1,
                    calibration=str(
                        ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"
                    ),
                ),
                CameraInputs(
                    number=5,
                    calibration=str(
                        ref_data / "camera-tunnel-calibration" / "camera05_35_6.json"
                    ),
                ),
            ],
            grid=str(ref_data / "fml_tc3_volume.grid"),
            grid_tol=0.388202,
            overlap="average_view",
            registration="none",
            target_patcher="none",
        )
        state = run_phase0(cfg, [img, img.copy()])
        v1 = np.array(state.projections[0].visible)
        v2 = np.array(state.projections[1].visible)
        w1 = np.array(state.projections[0].weight)
        w2 = np.array(state.projections[1].weight)
        both = v1 & v2
        # AverageViews: weights sum to 1 with both cameras contributing
        np.testing.assert_allclose(w1[both] + w2[both], 1.0, atol=1e-5)
        assert (w1[both] > 0).all() and (w2[both] > 0).all()
