"""Differentiable pinhole + Brown-distortion camera model (pure JAX).

Replaces ``cv2.projectPoints`` / ``cv2.Rodrigues`` and the C++ ``CameraCal``
(cpp/include/CameraCal.h:41-170; python/upsp/cam_cal_utils/photogrammetry.py:165
— behavior studied, not copied).  All functions are jittable, vmappable, and
differentiable; Jacobians come from ``jax.jacfwd`` instead of OpenCV's
hand-rolled derivative chain, and match cv2's ordering
``[drvec(3), dtvec(3), df(2), dc(2), ddist(5)]`` for drop-in parity tests.

Conventions (identical to the reference Python stack):
- ``rmat``/``tvec`` transform model/object points into the camera frame:
  ``x_cam = R @ X + t``.
- Pixels: ``u = fx * x' + cx``, with (x', y') the distorted normalized coords.
- Camera center in object frame: ``-R^T t``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraParams(NamedTuple):
    """Pytree of differentiable camera parameters (float64-safe)."""

    rvec: jax.Array  # (3,) Rodrigues rotation object->camera
    tvec: jax.Array  # (3,)
    fx: jax.Array  # ()
    fy: jax.Array  # ()
    cx: jax.Array  # ()
    cy: jax.Array  # ()
    dist: jax.Array  # (5,) [k1 k2 p1 p2 k3]

    @property
    def camera_matrix(self):
        z = jnp.zeros((), self.fx.dtype)
        o = jnp.ones((), self.fx.dtype)
        return jnp.array(
            [[self.fx, z, self.cx], [z, self.fy, self.cy], [z, z, o]]
        )


def make_camera_params(rmat, tvec, camera_matrix, dist_coeffs, dtype=jnp.float64):
    """Build CameraParams from OpenCV-style matrices (host-side)."""
    rvec = rmat_to_rvec(np.asarray(rmat))
    cm = np.asarray(camera_matrix)
    return CameraParams(
        rvec=jnp.asarray(rvec, dtype),
        tvec=jnp.asarray(np.asarray(tvec).reshape(3), dtype),
        fx=jnp.asarray(cm[0, 0], dtype),
        fy=jnp.asarray(cm[1, 1], dtype),
        cx=jnp.asarray(cm[0, 2], dtype),
        cy=jnp.asarray(cm[1, 2], dtype),
        dist=jnp.asarray(np.asarray(dist_coeffs).reshape(-1)[:5], dtype),
    )


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Rotation vector -> rotation matrix, stable at theta -> 0."""
    theta = jnp.linalg.norm(rvec)
    safe = jnp.where(theta > 1e-12, theta, 1.0)
    k = rvec / safe
    K = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]],
        dtype=rvec.dtype,
    )
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3, dtype=rvec.dtype) + s * K + (1.0 - c) * (K @ K)
    # first-order fallback near zero rotation keeps jacfwd finite
    K0 = jnp.array(
        [
            [0.0, -rvec[2], rvec[1]],
            [rvec[2], 0.0, -rvec[0]],
            [-rvec[1], rvec[0], 0.0],
        ],
        dtype=rvec.dtype,
    )
    return jnp.where(theta > 1e-12, R, jnp.eye(3, dtype=rvec.dtype) + K0)


def rmat_to_rvec(rmat: np.ndarray) -> np.ndarray:
    """Rotation matrix -> rotation vector (host-side numpy)."""
    R = np.asarray(rmat, np.float64)
    cos_theta = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    if theta < 1e-12:
        return np.zeros(3)
    if np.pi - theta < 1e-6:
        # near 180 deg: axis from R + I
        A = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs using off-diagonals
        if axis[0] > 0:
            axis[1] *= np.sign(A[0, 1]) if A[0, 1] != 0 else 1.0
            axis[2] *= np.sign(A[0, 2]) if A[0, 2] != 0 else 1.0
        elif axis[1] > 0:
            axis[2] *= np.sign(A[1, 2]) if A[1, 2] != 0 else 1.0
        axis = axis / np.linalg.norm(axis)
        return axis * theta
    axis = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2.0 * np.sin(theta))
    )
    return axis * theta


def distort_normalized(xy: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply Brown 5-coefficient distortion to normalized coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(
    xy_dist: jax.Array, dist: jax.Array, iters: int = 8
) -> jax.Array:
    """Invert Brown distortion by fixed-point iteration (like cv2.undistortPoints)."""

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn = (xy_dist[..., 0] - dx) / radial
        yn = (xy_dist[..., 1] - dy) / radial
        return jnp.stack([xn, yn], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xy_dist)


def project_points(params: CameraParams, points: jax.Array) -> jax.Array:
    """Project object-frame points (..., 3) to pixel coordinates (..., 2)."""
    R = rodrigues(params.rvec)
    xc = points @ R.T + params.tvec
    xy = xc[..., :2] / xc[..., 2:3]
    xyd = distort_normalized(xy, params.dist)
    u = params.fx * xyd[..., 0] + params.cx
    v = params.fy * xyd[..., 1] + params.cy
    return jnp.stack([u, v], axis=-1)


def _project_flat(flat_params: jax.Array, points: jax.Array) -> jax.Array:
    """Projection parameterized by the cv2 jacobian ordering (15 params)."""
    p = CameraParams(
        rvec=flat_params[0:3],
        tvec=flat_params[3:6],
        fx=flat_params[6],
        fy=flat_params[7],
        cx=flat_params[8],
        cy=flat_params[9],
        dist=flat_params[10:15],
    )
    return project_points(p, points)


def flatten_params(params: CameraParams) -> jax.Array:
    return jnp.concatenate(
        [
            params.rvec,
            params.tvec,
            jnp.stack([params.fx, params.fy, params.cx, params.cy]),
            params.dist,
        ]
    )


@functools.partial(jax.jit, static_argnames=("full",))
def project_points_jac(params: CameraParams, points: jax.Array, full: bool = False):
    """Projection + Jacobian, cv2.projectPoints ordering.

    Returns (projs (N,2), jacs (N,2,6) or (N,2,15)).
    """
    flat = flatten_params(params)
    projs = _project_flat(flat, points)
    jac = jax.jacfwd(_project_flat)(flat, points)  # (N, 2, 15)
    if not full:
        jac = jac[..., :6]
    return projs, jac


def cam_center(params: CameraParams) -> jax.Array:
    """Camera center in the object frame: -R^T t."""
    R = rodrigues(params.rvec)
    return -(R.T @ params.tvec)


def pixel_rays(params: CameraParams, pixels: jax.Array) -> jax.Array:
    """Unit rays (object frame) through pixels (..., 2), from the camera center."""
    xn = (pixels[..., 0] - params.cx) / params.fx
    yn = (pixels[..., 1] - params.cy) / params.fy
    xy = undistort_normalized(jnp.stack([xn, yn], axis=-1), params.dist)
    d_cam = jnp.concatenate([xy, jnp.ones(xy.shape[:-1] + (1,), xy.dtype)], axis=-1)
    R = rodrigues(params.rvec)
    d_obj = d_cam @ R  # R^T @ d per-ray
    return d_obj / jnp.linalg.norm(d_obj, axis=-1, keepdims=True)


def reprojection_error(params: CameraParams, points: jax.Array, pixels: jax.Array):
    """RMS and max reprojection error in pixels."""
    proj = project_points(params, points)
    err = jnp.linalg.norm(proj - pixels, axis=-1)
    return jnp.sqrt(jnp.mean(err**2)), jnp.max(err)


# ---------------------------------------------------------------------------
# host-side convenience mirrors of photogrammetry.py


def rot(angle_deg: float, axis: str) -> np.ndarray:
    """Single-axis rotation matrix, angle in degrees (host-side)."""
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    raise ValueError("axis must be x, y or z")


def inv_transform(R: np.ndarray, t: np.ndarray):
    """Inverse of a rigid transform: (R^T, -R^T t)."""
    Rt = np.asarray(R).T
    return Rt, -(Rt @ np.asarray(t).reshape(3, 1))
