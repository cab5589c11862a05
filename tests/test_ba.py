"""Bundle adjustment tests: synthetic multi-camera rig recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upsp_tpu.camera.ba import (
    BAProblem,
    build_problem,
    bundle_adjust,
    poses_to_rmat_tvec,
)
from upsp_tpu.camera.model import (
    make_camera_params,
    project_points,
    rmat_to_rvec,
    rot,
)


def make_rig(rng, n_cams=3, n_pts=40, noise_px=0.05):
    """Cameras around a plate of targets; returns truth + noisy observations."""
    K = np.array([[1200.0, 0, 512], [0, 1200.0, 400], [0, 0, 1]])
    dist = np.array([-0.05, 0.0, 0.0, 0.0, 0.0])
    pts = rng.uniform(-5, 5, size=(n_pts, 3)) * [1, 0.8, 0.15]
    cams, obs = [], []
    for c in range(n_cams):
        rmat = (
            rot(8.0 * (c - 1), "y") @ rot(4.0, "x") @ np.diag([1.0, -1.0, -1.0])
        )
        tvec = np.array([0.3 * c - 0.3, 0.1, 16.0 + 0.5 * c])
        p = make_camera_params(rmat, tvec, K, dist)
        cams.append(p)
        uv = np.array(project_points(p, jnp.asarray(pts)))
        uv_noisy = uv + rng.normal(0, noise_px, uv.shape)
        for k in range(n_pts):
            obs.append((c, k, uv_noisy[k]))
    return cams, pts, obs


class TestBundleAdjust:
    def test_recovers_perturbed_poses(self, rng):
        cams, pts, obs = make_rig(rng)
        # perturb every camera's pose before building the problem
        perturbed = []
        for c, p in enumerate(cams):
            R = np.array(
                rot(0.3, "x") @ rot(-0.2, "y")
            ) @ np.array(jnp.asarray(jnp.eye(3)))
            rv = rmat_to_rvec(
                R @ np.array(jax.jit(lambda r: r)(jnp.eye(3)))  # identity guard
            )
            perturbed.append(
                p._replace(
                    rvec=p.rvec + jnp.asarray([0.004, -0.003, 0.002]),
                    tvec=p.tvec + jnp.asarray([0.03, -0.02, 0.05]),
                )
            )
        prob = build_problem(perturbed, pts, obs, prior_sigma=0.005)
        res = bundle_adjust(prob, n_iters=25)
        assert float(res.rms) < 0.08  # down to the injected noise level
        rmats, tvecs = poses_to_rmat_tvec(res)
        for c, p in enumerate(cams):
            # statistical floor set by 0.05 px noise on near-planar points
            np.testing.assert_allclose(
                np.array(res.poses[c, :3]), np.array(p.rvec), atol=5e-4
            )
            np.testing.assert_allclose(tvecs[c], np.array(p.tvec), atol=1e-2)

    def test_points_stay_near_prior(self, rng):
        cams, pts, obs = make_rig(rng)
        prob = build_problem(cams, pts, obs, prior_sigma=0.002)
        res = bundle_adjust(prob, n_iters=15)
        drift = np.linalg.norm(np.array(res.points) - pts, axis=1)
        assert drift.max() < 0.01  # tight survey prior holds the gauge

    def test_joint_beats_single_camera_noise(self, rng):
        """With shared 3D points, joint BA averages out per-camera noise."""
        cams, pts, obs = make_rig(rng, n_cams=4, noise_px=0.3)
        perturbed = [
            p._replace(tvec=p.tvec + jnp.asarray([0.05, -0.04, 0.08]))
            for p in cams
        ]
        prob = build_problem(perturbed, pts, obs, prior_sigma=0.01)
        res = bundle_adjust(prob, n_iters=25)
        _, tvecs = poses_to_rmat_tvec(res)
        for c, p in enumerate(cams):
            assert np.linalg.norm(tvecs[c] - np.array(p.tvec)) < 0.02

    def test_mesh_sharded_matches_single_device(self, rng):
        """Observations sharded over the 8-device mesh + psum block assembly
        reproduce the single-device solve — the distributed-BA north star
        (SURVEY.md section 2.3 closing note) executed, not just plumbed."""
        from jax.sharding import Mesh, PartitionSpec as P

        from upsp_tpu.camera.ba import BAResult

        cams, pts, obs = make_rig(rng, n_cams=3, n_pts=40)  # O=120 = 8*15
        perturbed = [
            p._replace(tvec=p.tvec + jnp.asarray([0.03, -0.02, 0.05]))
            for p in cams
        ]
        prob = build_problem(perturbed, pts, obs, prior_sigma=0.005)
        oracle = bundle_adjust(prob, n_iters=15)

        mesh = Mesh(np.array(jax.devices()), ("obs",))
        obs_spec = BAProblem(
            poses=P(), points=P(), points0=P(), intrinsics=P(),
            cam_idx=P("obs"), pt_idx=P("obs"), uv=P("obs"), weight=P("obs"),
            prior_sigma=P(),
        )
        fn = jax.shard_map(
            lambda pr: bundle_adjust(pr, n_iters=15, axis_name="obs"),
            mesh=mesh,
            in_specs=(obs_spec,),
            out_specs=BAResult(poses=P(), points=P(), rms=P(), n_iters=P()),
            check_vma=False,
        )
        res = fn(prob)
        np.testing.assert_allclose(
            np.array(res.poses), np.array(oracle.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.array(res.points), np.array(oracle.points), atol=1e-8
        )
        assert float(res.rms) == pytest.approx(float(oracle.rms), abs=1e-9)

    def test_masked_observations_ignored(self, rng):
        cams, pts, obs = make_rig(rng, n_cams=2, n_pts=20)
        prob = build_problem(cams, pts, obs, prior_sigma=0.005)
        # corrupt some observations but zero their weights
        uv = np.array(prob.uv)
        uv[:5] += 500.0
        prob = prob._replace(
            uv=jnp.asarray(uv),
            weight=prob.weight.at[:5].set(0.0),
        )
        res = bundle_adjust(prob, n_iters=15)
        assert float(res.rms) < 0.1
