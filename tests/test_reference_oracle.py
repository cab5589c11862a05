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
