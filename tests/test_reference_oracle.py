"""Oracle tests against the reference's OWN Python implementations.

The reference ships pure-Python ports of the hot phase-0 semantics
(python/upsp/cam_cal_utils/photogrammetry.py, intensity_mapping/patching.py,
intensity_mapping/node_pixel_mapping.py) that run in this environment.  These
tests execute that code directly on the real wind-tunnel fixture and compare
our kernels against it — the analog of the reference's vv regression dumps
(psp_process.cpp:2006-2015: subsampled values "checked for floating-point
equality between versions of the processing code"), but with the reference
itself as the baseline version.  Drift in projection/Jacobian/patching
semantics fails here even if our implementation stays self-consistent.

The resulting values are also locked as vv-*.dat files and compared through
scripts/upsp-vv-compare so the CLI path is exercised.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_PY = "/root/reference/python"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PY), reason="reference python not available"
)
sys.path.insert(0, REF_PY)


def setup_module(module):
    _shim_optional_deps()


def _shim_optional_deps():
    """Stub shapely + the pybind11 raycast module so the reference's pure-
    Python calibration modules import (neither is used by what we call)."""
    import types

    for name, attrs in [
        ("shapely", {}),
        ("shapely.geometry", {"Polygon": object}),
        ("upsp.raycast", {}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m


class TestParserOracle:
    """Byte-level file-format parity: our parsers vs the reference's own
    parsers on the SAME fixture files (parsers.py:7-425)."""

    def test_tgts_parse_identical(self, ref_data):
        from upsp.cam_cal_utils import parsers as ref_parsers

        from upsp_tpu.io.tgts import read_tgts

        path = str(ref_data / "fml_tc3_volume.tgts")
        ref = ref_parsers.read_tgts(path)
        ours = read_tgts(path)
        assert len(ours) == len(ref)
        for t_ref, t in zip(ref, ours):
            np.testing.assert_allclose(t.xyz, t_ref["tvec"].reshape(3))
            np.testing.assert_allclose(t.norm, t_ref["norm"].reshape(3))
            assert t.diameter == pytest.approx(t_ref["size"])
            assert t.target_type == t_ref["target_type"]
            assert t.idx == t_ref["idx"]

    def test_wtd_parse_identical(self, ref_data):
        from upsp.cam_cal_utils import parsers as ref_parsers

        from upsp_tpu.io.wtd import read_wtd

        path = str(ref_data / "wtd_test.wtd")
        ref = ref_parsers.read_wind_tunnel_data(path)
        cond = read_wtd(path)
        ours = {"ALPHA": cond.alpha, "BETA": cond.beta, "PHI": cond.phi,
                "STRUTZ": cond.strutz}
        for k, v in ref.items():
            assert ours[k] == pytest.approx(v), k

    def test_max_inlier_scaling_identical(self, ref_data):
        """Our 8-bit max-inlier normalization == img_utils.scale_image_max_inlier
        on the real fixture camera frame (the swdd-documented algorithm)."""
        from upsp.cam_cal_utils import img_utils as ref_iu

        from upsp_tpu.ops.image import scale_image_max_inlier

        img = cv2.imread(
            str(ref_data / "images" /
                "CAM1_RUN8_CINE02_Y20000209H11294501.00001.png"),
            cv2.IMREAD_GRAYSCALE + cv2.IMREAD_ANYDEPTH,
        )
        ref = ref_iu.scale_image_max_inlier(img)
        ours = scale_image_max_inlier(img)
        np.testing.assert_array_equal(np.asarray(ours), ref)


class TestTunnelTransformOracle:
    def test_tunnel_transform_matches_reference(self, ref_data):
        """[P][Y][R] strutz chain == camera_tunnel_calibrate.tunnel_transform
        on the fixture WTD angles."""
        from upsp.cam_cal_utils import camera_tunnel_calibrate as ref_ctc
        from upsp.cam_cal_utils import parsers as ref_parsers

        from upsp_tpu.camera.tunnel import tf_camera_tgts_thru_tunnel, tunnel_transform
        from upsp_tpu.io.camera_json import read_camera_json

        wtd = ref_parsers.read_wind_tunnel_data(str(ref_data / "wtd_test.wtd"))
        tvec_cor = np.array([1.25, -2.5, 0.75])
        R_ref, t_ref = ref_ctc.tunnel_transform(
            wtd["ALPHA"], wtd["BETA"], wtd["PHI"], wtd["STRUTZ"],
            tvec_cor.reshape(3, 1),
        )
        R, t = tunnel_transform(
            wtd["ALPHA"], wtd["BETA"], wtd["PHI"], wtd["STRUTZ"], tvec_cor
        )
        np.testing.assert_allclose(R, R_ref, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(t).reshape(3), np.asarray(t_ref).reshape(3), atol=1e-12
        )

        # full chain with the fixture camera-tunnel calibration
        cal = read_camera_json(
            str(ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"),
            dims_hw=(512, 1024),
        )
        ctc_list = [cal.rmat, cal.tvec.reshape(3, 1), cal.camera_matrix,
                    cal.dist_coeffs]
        cfg = {"tunnel-cor_to_tgts_tvec": tvec_cor.reshape(3, 1)}
        R2_ref, t2_ref = ref_ctc.tf_camera_tgts_thru_tunnel(ctc_list, wtd, cfg)
        R2, t2 = tf_camera_tgts_thru_tunnel(cal.rmat, cal.tvec, wtd, cfg)
        np.testing.assert_allclose(R2, R2_ref, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(t2).reshape(3), np.asarray(t2_ref).reshape(3),
            atol=1e-12,
        )


@pytest.fixture(scope="module")
def fixture_cam(ref_data):
    """Fixture camera01 as (rmat, tvec, cameraMatrix(abs), distCoeffs, hw)."""
    from upsp_tpu.io.camera_json import read_camera_json

    img = cv2.imread(
        str(ref_data / "images" / "CAM1_RUN8_CINE02_Y20000209H11294501.00001.png"),
        cv2.IMREAD_GRAYSCALE,
    )
    hw = img.shape
    cal = read_camera_json(
        str(ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"), hw
    )
    return cal, hw, img


class TestPhotogrammetryOracle:
    def test_rot_and_inv_transform(self):
        from upsp.cam_cal_utils import photogrammetry as ref_pg

        from upsp_tpu.camera.model import inv_transform, rot

        for axis in "xyz":
            np.testing.assert_allclose(
                rot(17.5, axis), ref_pg.rot(17.5, axis), atol=1e-12
            )
        R = ref_pg.rot(20.0, "x") @ ref_pg.rot(-35.0, "y")
        t = np.array([[1.0], [2.0], [-3.0]])
        Ri, ti = inv_transform(R, t.ravel())
        Rr, tr = ref_pg.invTransform(R, t)
        np.testing.assert_allclose(Ri, Rr, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ti).ravel(), tr.ravel(), atol=1e-12)

    def test_projection_and_jacobian_match_reference(self, fixture_cam, ref_data):
        """project_points(+jac) == the reference's cv2.projectPoints wrapper
        on the fixture camera and the fixture tgts 3D points."""
        from upsp.cam_cal_utils import photogrammetry as ref_pg

        from upsp_tpu.camera.model import make_camera_params, project_points_jac
        from upsp_tpu.io.tgts import read_tgts

        cal, hw, _ = fixture_cam
        tgts = read_tgts(str(ref_data / "fml_tc3_volume.tgts"))
        pts = np.stack([t.xyz for t in tgts])

        ref_projs, ref_jacs = ref_pg.project_3d_point(
            cal.rmat, cal.tvec.reshape(3, 1), cal.camera_matrix,
            cal.dist_coeffs, pts, ret_jac=True,
        )
        params = make_camera_params(
            cal.rmat, cal.tvec, cal.camera_matrix, cal.dist_coeffs
        )
        import jax.numpy as jnp

        projs, jacs = project_points_jac(params, jnp.asarray(pts, jnp.float64))
        np.testing.assert_allclose(np.asarray(projs), ref_projs, atol=1e-6)
        # rvec/tvec Jacobian block, cv2 column ordering
        np.testing.assert_allclose(
            np.asarray(jacs), ref_jacs, rtol=1e-5, atol=1e-6
        )


class TestNodePixelMappingOracle:
    def test_non_keyframe_remap_matches_reference(self, fixture_cam, fml_grid):
        """First-order pose remap == node_to_pixel_mapping_non_keyframe."""
        if not hasattr(np, "NAN"):  # the reference predates numpy 2
            np.NAN = np.nan
        from upsp.intensity_mapping import node_pixel_mapping as ref_npm

        import jax.numpy as jnp

        from upsp_tpu.camera.model import make_camera_params, rodrigues
        from upsp_tpu.ops.node_pixel_mapping import keyframe_mapping, remap

        cal, hw, _ = fixture_cam
        verts = np.concatenate([z.reshape(-1, 3) for z in
                                [np.stack([s.ravel() for s in
                                           (fml_grid.x[i], fml_grid.y[i],
                                            fml_grid.z[i])], axis=1)
                                 for i in range(len(fml_grid.x))]])[::701]
        params = make_camera_params(
            cal.rmat, cal.tvec, cal.camera_matrix, cal.dist_coeffs
        )
        mapping = keyframe_mapping(params, jnp.asarray(verts, jnp.float64))

        # small vibration-scale pose change
        drvec = np.array([4e-4, -2e-4, 3e-4])
        dtvec = np.array([0.01, -0.02, 0.015])
        rvec_key = cv2.Rodrigues(cal.rmat)[0]
        rvec_curr = rvec_key + drvec.reshape(3, 1)
        rmat_curr = cv2.Rodrigues(rvec_curr)[0]
        tvec_curr = cal.tvec.reshape(3, 1) + dtvec.reshape(3, 1)

        vis = np.arange(verts.shape[0])
        ref_out = ref_npm.node_to_pixel_mapping_non_keyframe(
            cal.rmat, cal.tvec.reshape(3, 1), rmat_curr, tvec_curr,
            np.asarray(mapping.uv), np.asarray(mapping.jac), vis,
        )
        new_pose = jnp.concatenate(
            [jnp.asarray(rvec_curr.ravel()), jnp.asarray(tvec_curr.ravel())]
        )
        ours = np.asarray(remap(mapping, new_pose))
        np.testing.assert_allclose(ours, ref_out, rtol=1e-6, atol=1e-6)


class TestLocalizationOracle:
    def test_super_gaussian_centers_match_reference(self):
        """Batched LM super-Gaussian localization vs the reference's
        scipy.curve_fit localizer (gaussian_localization_methods.py:154) on
        identical noisy dot crops: both land within the 0.05-px-median spec
        (docs/md/upsp-swdd.md:136) and within 0.05 px of EACH OTHER."""
        import jax.numpy as jnp

        from upsp.target_operations.gaussian_localization_methods import (
            gauss_fitter_func,
        )

        from upsp_tpu.ops.localization import localize_targets

        ref_fit = gauss_fitter_func("super")
        rng = np.random.default_rng(21)
        H, W = 64, 64
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        pair_d, err_ref, err_ours = [], [], []
        for k in range(8):
            cx = 32 + rng.uniform(-0.5, 0.5)
            cy = 32 + rng.uniform(-0.5, 0.5)
            quad = ((xx - cx) ** 2) / (2 * 1.4**2) + ((yy - cy) ** 2) / (
                2 * 1.4**2
            )
            img = 200.0 - 150.0 * np.exp(-np.power(quad, 3.0))
            img += rng.normal(0, 1.0, (H, W))
            img8 = np.clip(img, 0, 255).astype(np.uint8)

            got = ref_fit(img8, center=(32.0, 32.0), target_type="dot")
            ref_center = got[0]
            assert ref_center is not None

            res = localize_targets(
                jnp.asarray(img8.astype(np.float32)),
                jnp.asarray(np.array([[32.0, 32.0]])),
                jnp.asarray(np.array([0])),
                jnp.asarray(np.array([4])),
                crop_size=11,
            )
            assert bool(res.valid[0])
            ours = np.array(res.centers[0])
            pair_d.append(np.linalg.norm(ours - np.asarray(ref_center)))
            err_ref.append(np.linalg.norm(np.asarray(ref_center) - [cx, cy]))
            err_ours.append(np.linalg.norm(ours - [cx, cy]))
        assert np.median(err_ours) < 0.06
        assert np.median(err_ref) < 0.06
        assert np.median(pair_d) < 0.06
        # our fit must not be worse than the reference's on the same data
        assert np.median(err_ours) < np.median(err_ref) + 0.02


class TestPatchingOracle:
    def test_polyfit2d_matches_reference(self):
        """Identical boundary sets -> identical deg-3 fills (both lstsq)."""
        from upsp.intensity_mapping import patching as ref_patch

        from upsp_tpu.ops.patching import polyfit2d, polyval2d

        rng = np.random.default_rng(7)
        bounds = rng.integers(0, 14, size=(40, 2)).astype(np.float64)
        x, y = bounds[:, 0], bounds[:, 1]
        z = (
            3.0 + 0.5 * x - 0.2 * y + 0.03 * x * y
            - 0.01 * x**2 + 0.004 * y**2 + 0.0005 * x**2 * y
        )
        internals = rng.integers(0, 14, size=(25, 2)).astype(np.float64)

        ref_coeffs = ref_patch.polyfit2D(bounds, z)
        ref_fill = ref_patch.polyval2D(internals, ref_coeffs)
        coeffs = polyfit2d(x, y, z)
        fill = polyval2d(internals[:, 0], internals[:, 1], coeffs)
        # reference builds the basis in float32; match to that precision
        np.testing.assert_allclose(fill, ref_fill, rtol=2e-4, atol=2e-3)

    def test_patched_frame_matches_reference_fill(self, fixture_cam):
        """End-to-end single-fiducial patch vs the reference patchFiducials.

        Both patchers fill the interior from a 3rd-order fit of surrounding
        pixels; on a smooth scene the fills must agree to sub-intensity
        levels even though clustering/boundary bookkeeping differ.
        """
        from upsp.intensity_mapping import patching as ref_patch

        import jax.numpy as jnp

        from upsp_tpu.camera.model import make_camera_params, project_points
        from upsp_tpu.ops.patching import (
            PatchCluster,
            apply_patches,
            build_patch_clusters,
            build_patch_operator,
        )

        cal, hw, _ = fixture_cam
        H, W = 96, 128
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        img = 900 + 2.1 * xx + 1.2 * yy + 0.01 * xx * yy - 0.008 * xx**2

        # one fiducial 3D point that projects near the image center
        params = make_camera_params(
            cal.rmat, cal.tvec, cal.camera_matrix, cal.dist_coeffs
        )
        # find a 3D point projecting to ~(64, 48): shoot the pixel ray
        from upsp_tpu.camera.model import cam_center, pixel_rays

        target_uv = np.array([[64.0, 48.0]])
        ray = np.asarray(
            pixel_rays(params, jnp.asarray(target_uv, jnp.float64))
        )[0]
        origin = np.asarray(cam_center(params))
        pt3d = origin + 25.0 * ray
        uv = np.asarray(project_points(params, jnp.asarray(pt3d[None])))[0]
        assert np.allclose(uv, target_uv[0], atol=1e-6)

        size_in = 0.10  # fiducial diameter (inches)
        fid = {
            "tvec": pt3d.reshape(3, 1),
            "target_type": "dot",
            "size": size_in,
        }
        ref_img = ref_patch.patchFiducials(
            [fid], img.copy(), cal.rmat, cal.tvec.reshape(3, 1),
            cal.camera_matrix, cal.dist_coeffs,
            boundary_thickness=2, buffer_thickness_in=0.02,
        )
        changed = np.argwhere(ref_img != img)
        assert changed.size > 0

        # our patcher on the same fiducial: image diameter from projection
        d_edge = np.asarray(
            project_points(
                params,
                jnp.asarray(
                    pt3d[None] + 0.5 * (size_in + 2 * 0.02) * np.array([[1.0, 0, 0]]),
                    jnp.float64,
                ),
            )
        )[0]
        diam = 2 * np.linalg.norm(d_edge - uv)
        clusters = build_patch_clusters(
            uv[None], np.array([diam]), (H, W), bound_pts=2, buffer=0
        )
        op = build_patch_operator(clusters, (H, W))
        ours = np.asarray(apply_patches(jnp.asarray(img, jnp.float32), op))

        # compare fills on the pixels the reference patched
        ys, xs = changed[:, 0], changed[:, 1]
        assert np.abs(ours[ys, xs] - ref_img[ys, xs]).max() < 1.0
        # and our patch actually covers the reference's interior
        assert (ours[ys, xs] != img[ys, xs]).mean() > 0.9

    def test_vv_lock_via_cli(self, fixture_cam, ref_data, tmp_path):
        """Reference-oracle values locked as vv dumps, compared by the CLI."""
        from upsp.cam_cal_utils import photogrammetry as ref_pg

        import jax.numpy as jnp

        from upsp_tpu.camera.model import make_camera_params, project_points
        from upsp_tpu.io.flatfile import write_vv
        from upsp_tpu.io.tgts import read_tgts

        cal, hw, _ = fixture_cam
        tgts = read_tgts(str(ref_data / "fml_tc3_volume.tgts"))
        pts = np.stack([t.xyz for t in tgts])
        ref_projs = ref_pg.project_3d_point(
            cal.rmat, cal.tvec.reshape(3, 1), cal.camera_matrix,
            cal.dist_coeffs, pts,
        )
        params = make_camera_params(
            cal.rmat, cal.tvec, cal.camera_matrix, cal.dist_coeffs
        )
        projs = np.asarray(project_points(params, jnp.asarray(pts, jnp.float64)))

        a, b = tmp_path / "ref", tmp_path / "ours"
        a.mkdir(), b.mkdir()
        write_vv(str(a / "vv-proj-uv.dat"), ref_projs.ravel())
        write_vv(str(b / "vv-proj-uv.dat"), projs.ravel())
        r = subprocess.run(
            [sys.executable, "/root/repo/scripts/upsp-vv-compare",
             str(a), str(b), "--atol", "1e-5"],
            capture_output=True, text=True,
            env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo"),
        )
        assert r.returncode == 0, r.stdout + r.stderr
