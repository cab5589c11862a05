"""Camera model parity tests: JAX projection vs cv2.projectPoints (oracle)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

jax.config.update("jax_enable_x64", True)

from upsp_tpu.camera.model import (
    CameraParams,
    cam_center,
    make_camera_params,
    pixel_rays,
    project_points,
    project_points_jac,
    rmat_to_rvec,
    rodrigues,
    rot,
)
from upsp_tpu.camera.tunnel import tf_camera_tgts_thru_tunnel, tunnel_transform
from upsp_tpu.io import read_camera_json


@pytest.fixture(scope="module")
def cam(ref_data):
    return read_camera_json(
        str(ref_data / "camera-tunnel-calibration" / "camera01_35_6.json"),
        dims_hw=(512, 1024),
    )


@pytest.fixture(scope="module")
def params(cam):
    return make_camera_params(cam.rmat, cam.tvec, cam.camera_matrix, cam.dist_coeffs)


@pytest.fixture(scope="module")
def obj_pts(rng):
    # points in front of the camera01 rig (model is near origin, cam looks -z)
    return rng.uniform(-8, 8, size=(200, 3)) * np.array([1.0, 0.5, 0.2]) + np.array(
        [0.0, 0.0, -6.5]
    )


class TestRodrigues:
    def test_vs_cv2(self, rng):
        for _ in range(20):
            rv = rng.normal(size=3)
            R_cv, _ = cv2.Rodrigues(rv)
            R_jx = np.array(rodrigues(np.asarray(rv)))
            np.testing.assert_allclose(R_jx, R_cv, atol=1e-12)

    def test_inverse(self, rng):
        for _ in range(20):
            rv = rng.normal(size=3)
            R = np.array(rodrigues(np.asarray(rv)))
            rv_back = rmat_to_rvec(R)
            # rmat_to_rvec returns the canonical (theta <= pi) representation,
            # which differs from rv when |rv| > pi; compare rotations instead
            R_back = np.array(rodrigues(np.asarray(rv_back)))
            np.testing.assert_allclose(R_back, R, atol=1e-9)
            assert np.linalg.norm(rv_back) <= np.pi + 1e-9

    def test_zero(self):
        np.testing.assert_allclose(np.array(rodrigues(np.zeros(3))), np.eye(3))


class TestProjection:
    def test_vs_cv2(self, cam, params, obj_pts):
        rvec = rmat_to_rvec(cam.rmat)
        proj_cv, _ = cv2.projectPoints(
            obj_pts, rvec, cam.tvec.reshape(3, 1), cam.camera_matrix, cam.dist_coeffs
        )
        proj_cv = proj_cv.squeeze(1)
        proj_jx = np.array(project_points(params, obj_pts))
        np.testing.assert_allclose(proj_jx, proj_cv, atol=1e-8)

    def test_jacobian_vs_cv2(self, cam, params, obj_pts):
        pts = obj_pts[:25]
        rvec = rmat_to_rvec(cam.rmat)
        proj_cv, jac_cv = cv2.projectPoints(
            pts, rvec, cam.tvec.reshape(3, 1), cam.camera_matrix, cam.dist_coeffs
        )
        jac_cv = jac_cv.reshape(pts.shape[0], 2, -1)  # (N,2,15)
        projs, jacs = project_points_jac(params, pts, full=True)
        np.testing.assert_allclose(np.array(projs), proj_cv.squeeze(1), atol=1e-8)
        np.testing.assert_allclose(np.array(jacs), jac_cv, atol=1e-5, rtol=1e-4)

    def test_jacobian_6dof(self, params, obj_pts):
        _, jacs = project_points_jac(params, obj_pts[:5])
        assert jacs.shape == (5, 2, 6)

    def test_cam_center(self, cam, params):
        center_expected = -cam.rmat.T @ cam.tvec
        np.testing.assert_allclose(np.array(cam_center(params)), center_expected, atol=1e-10)

    def test_pixel_rays_roundtrip(self, params, obj_pts):
        """A ray through a projected pixel must pass through the 3D point."""
        pts = obj_pts[:50]
        pix = project_points(params, pts)
        rays = np.array(pixel_rays(params, pix))
        c = np.array(cam_center(params))
        d = pts - c
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        np.testing.assert_allclose(rays, d, atol=1e-6)


class TestTunnelTransform:
    def test_zero_angles_identity(self):
        rmat, tvec = tunnel_transform(0, 0, 0, 0, np.zeros((3, 1)))
        np.testing.assert_allclose(rmat, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(tvec, np.zeros((3, 1)), atol=1e-12)

    def test_strutz_shift(self):
        _, tvec = tunnel_transform(0, 0, 0, 10.0, np.zeros((3, 1)))
        np.testing.assert_allclose(tvec, [[0], [0], [10.0]])

    def test_angle_composition(self):
        rmat, _ = tunnel_transform(5.0, -3.0, 12.0, 0.0, np.zeros((3, 1)))
        expect = np.linalg.inv(rot(-5.0, "y") @ rot(3.0, "z") @ rot(12.0, "x"))
        np.testing.assert_allclose(rmat, expect, atol=1e-12)

    def test_chain_camera_to_tgts(self, cam, ref_data):
        from upsp_tpu.io import read_test_config

        cfg = read_test_config(str(ref_data / "test_config.json"))
        wtd = {"ALPHA": 0.05, "BETA": 0.12, "PHI": 0.90, "STRUTZ": 10.0}
        rmat, tvec = tf_camera_tgts_thru_tunnel(cam.rmat, cam.tvec, wtd, cfg)
        assert rmat.shape == (3, 3)
        assert tvec.shape == (3, 1)
        # must remain a proper rotation
        np.testing.assert_allclose(rmat @ rmat.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(rmat) == pytest.approx(1.0)
