"""Joint multi-camera bundle adjustment with Schur-complement reduction.

The reference solves each camera's pose independently with per-camera PnP
RANSAC (external_calibrate.py:1140); joint BA is this framework's capability
extension (BASELINE.json north star): all camera poses and the 3D target
positions refine together against every observation, with a strong prior
keeping targets near their surveyed tgts-file coordinates (they define the
model frame/gauge).

Solver: Levenberg–Marquardt on

    sum_obs || proj(pose_c, X_k) - uv_obs ||^2  +  sum_k ||X_k - X0_k||^2 / s^2

The normal system has the classic arrowhead structure; the point blocks
(3x3) are eliminated by a Schur complement onto the camera system (6C x 6C),
which stays tiny for any realistic rig.  Everything is batched: per-observation
Jacobians via ``jacfwd`` under ``vmap``, block assembly via ``segment_sum``.
When the observation set is sharded across devices, the block sums become
``psum``s over the mesh axis (`axis_name`) — the distributed-BA pattern of the
north star.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from upsp_tpu.camera.model import CameraParams, project_points, rodrigues


class BAProblem(NamedTuple):
    """Static-shape bundle-adjustment problem."""

    poses: jax.Array  # (C, 6) [rvec, tvec] per camera
    points: jax.Array  # (K, 3) target positions (initial = surveyed)
    points0: jax.Array  # (K, 3) survey prior centers
    intrinsics: jax.Array  # (C, 9) [fx fy cx cy k1 k2 p1 p2 k3]
    cam_idx: jax.Array  # (O,) observation -> camera
    pt_idx: jax.Array  # (O,) observation -> point
    uv: jax.Array  # (O, 2) measured pixel positions
    weight: jax.Array  # (O,) 0 disables (padding / outliers)
    prior_sigma: jax.Array  # () target-position prior stddev (model units)


class BAResult(NamedTuple):
    poses: jax.Array  # (C, 6)
    points: jax.Array  # (K, 3)
    rms: jax.Array  # () weighted reprojection RMS (pixels)
    n_iters: jax.Array


def _params_from(intr: jax.Array, pose6: jax.Array) -> CameraParams:
    return CameraParams(
        rvec=pose6[:3],
        tvec=pose6[3:6],
        fx=intr[0],
        fy=intr[1],
        cx=intr[2],
        cy=intr[3],
        dist=intr[4:9],
    )


def _residual_one(pose6, point, intr, uv):
    proj = project_points(_params_from(intr, pose6), point[None, :])[0]
    return proj - uv


def _all_residuals(poses, points, prob: BAProblem):
    def one(c, k, uv, w):
        return _residual_one(poses[c], points[k], prob.intrinsics[c], uv) * w

    return jax.vmap(one)(prob.cam_idx, prob.pt_idx, prob.uv, prob.weight)


@functools.partial(jax.jit, static_argnames=("n_iters", "axis_name"))
def bundle_adjust(
    prob: BAProblem, n_iters: int = 30, axis_name: Optional[str] = None
) -> BAResult:
    """LM with Schur elimination of point blocks; jit/shard_map compatible."""
    C = prob.poses.shape[0]
    K = prob.points.shape[0]
    inv_ps2 = 1.0 / (prob.prior_sigma**2)

    jac_pose = jax.jacfwd(_residual_one, argnums=0)
    jac_point = jax.jacfwd(_residual_one, argnums=1)

    def cost(poses, points):
        r = _all_residuals(poses, points, prob)
        prior = (points - prob.points0).ravel()
        c = jnp.sum(r * r) + inv_ps2 * jnp.sum(prior * prior)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    def step(poses, points, lam):
        def jacs(c, k, uv, w):
            Jc = jac_pose(poses[c], points[k], prob.intrinsics[c], uv) * w
            Jp = jac_point(poses[c], points[k], prob.intrinsics[c], uv) * w
            r = _residual_one(poses[c], points[k], prob.intrinsics[c], uv) * w
            return Jc, Jp, r

        Jc, Jp, r = jax.vmap(jacs)(
            prob.cam_idx, prob.pt_idx, prob.uv, prob.weight
        )  # (O,2,6), (O,2,3), (O,2)

        # block assembly (distributed: every segment_sum is psum-reducible)
        Hcc = jax.ops.segment_sum(
            jnp.einsum("oic,oid->ocd", Jc, Jc), prob.cam_idx, num_segments=C
        )  # (C,6,6)
        Hpp = jax.ops.segment_sum(
            jnp.einsum("oic,oid->ocd", Jp, Jp), prob.pt_idx, num_segments=K
        )  # (K,3,3)
        gc = jax.ops.segment_sum(
            jnp.einsum("oic,oi->oc", Jc, r), prob.cam_idx, num_segments=C
        )  # (C,6)
        gp = jax.ops.segment_sum(
            jnp.einsum("oic,oi->oc", Jp, r), prob.pt_idx, num_segments=K
        )  # (K,3)
        # dense camera-point coupling blocks W[c,k] (rigs are small)
        ck = prob.cam_idx * K + prob.pt_idx
        W = jax.ops.segment_sum(
            jnp.einsum("oic,oid->ocd", Jc, Jp), ck, num_segments=C * K
        ).reshape(C, K, 6, 3)
        if axis_name is not None:
            Hcc = jax.lax.psum(Hcc, axis_name)
            Hpp = jax.lax.psum(Hpp, axis_name)
            gc = jax.lax.psum(gc, axis_name)
            gp = jax.lax.psum(gp, axis_name)
            W = jax.lax.psum(W, axis_name)

        # survey prior on the points + LM damping
        eye3 = jnp.eye(3, dtype=Hpp.dtype)
        Hpp = Hpp + (inv_ps2 + lam)[None] * eye3[None]
        gp = gp + inv_ps2 * (points - prob.points0)
        Hcc = Hcc + lam * jnp.eye(6, dtype=Hcc.dtype)[None]

        # Schur complement onto cameras: S = Hcc - W Hpp^-1 W^T
        Hpp_inv = jnp.linalg.inv(Hpp)  # (K,3,3)
        WHinv = jnp.einsum("ckab,kbd->ckad", W, Hpp_inv)  # (C,K,6,3)
        S_blocks = jnp.einsum("ckad,mkbd->cmab", WHinv, W)  # (C,C,6,6)
        S = _blocks_to_dense(Hcc, S_blocks)
        rhs = (gc - jnp.einsum("ckad,kd->ca", WHinv, gp)).reshape(C * 6)
        d_cam = jnp.linalg.solve(S, rhs).reshape(C, 6)
        # back-substitute point updates
        d_pt = jnp.einsum(
            "kab,kb->ka",
            Hpp_inv,
            gp - jnp.einsum("ckad,ca->kd", W, d_cam),
        )
        return poses - d_cam, points - d_pt

    def body(carry, _):
        poses, points, lam, best_cost = carry
        new_poses, new_points = step(poses, points, lam)
        new_cost = cost(new_poses, new_points)
        improved = new_cost < best_cost
        poses = jnp.where(improved, new_poses, poses)
        points = jnp.where(improved, new_points, points)
        best_cost = jnp.where(improved, new_cost, best_cost)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 6.0), 1e-9, 1e8)
        return (poses, points, lam, best_cost), None

    init_cost = cost(prob.poses, prob.points)
    (poses, points, _, final_cost), _ = jax.lax.scan(
        body,
        (prob.poses, prob.points, jnp.asarray(1e-3, prob.poses.dtype), init_cost),
        None,
        length=n_iters,
    )
    r = _all_residuals(poses, points, prob)
    n_obs = jnp.maximum(jnp.sum(prob.weight > 0), 1)
    if axis_name is not None:
        ssq = jax.lax.psum(jnp.sum(r * r), axis_name)
        n_obs = jax.lax.psum(n_obs, axis_name)
    else:
        ssq = jnp.sum(r * r)
    rms = jnp.sqrt(ssq / n_obs)
    return BAResult(poses=poses, points=points, rms=rms, n_iters=jnp.int32(n_iters))


def _blocks_to_dense(Hcc: jax.Array, S_blocks: jax.Array) -> jax.Array:
    """Assemble dense (6C,6C) Schur system: diag(Hcc) - S_blocks."""
    C = Hcc.shape[0]
    S = -S_blocks.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    diag = jax.scipy.linalg.block_diag(*[Hcc[c] for c in range(C)])
    return S + diag


def build_problem(
    cam_params: list,
    target_xyz: np.ndarray,
    observations: list,
    prior_sigma: float = 0.01,
    dtype=jnp.float64,
) -> BAProblem:
    """Host-side assembly.

    ``observations``: list of (cam_index, point_index, (u, v)).
    ``prior_sigma``: how far targets may drift from their surveyed positions
    (model units — 0.01 in is tight, matching tgts-file survey accuracy).
    """
    C = len(cam_params)
    poses = np.zeros((C, 6))
    intr = np.zeros((C, 9))
    for c, p in enumerate(cam_params):
        poses[c, :3] = np.asarray(p.rvec)
        poses[c, 3:] = np.asarray(p.tvec)
        intr[c] = [
            float(p.fx), float(p.fy), float(p.cx), float(p.cy), *np.asarray(p.dist)
        ]
    cam_idx = np.array([o[0] for o in observations], np.int32)
    pt_idx = np.array([o[1] for o in observations], np.int32)
    uv = np.array([o[2] for o in observations], np.float64).reshape(-1, 2)
    return BAProblem(
        poses=jnp.asarray(poses, dtype),
        points=jnp.asarray(target_xyz, dtype),
        points0=jnp.asarray(target_xyz, dtype),
        intrinsics=jnp.asarray(intr, dtype),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uv, dtype),
        weight=jnp.ones(len(observations), dtype),
        prior_sigma=jnp.asarray(prior_sigma, dtype),
    )


def poses_to_rmat_tvec(result: BAResult):
    """(C,3,3) rotation matrices + (C,3) translations from the BA result."""
    rmats = np.stack(
        [np.array(rodrigues(result.poses[c, :3])) for c in range(result.poses.shape[0])]
    )
    tvecs = np.array(result.poses[:, 3:6])
    return rmats, tvecs
