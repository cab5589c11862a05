"""Keyframe node->pixel mapping with pose Jacobians + fast non-keyframe remap.

Parity with python/upsp/intensity_mapping/node_pixel_mapping.py:12-172
(studied, not copied): a *keyframe* computes every visible node's image
position AND its Jacobian w.r.t. the 6-DOF camera pose; intermediate frames
with slightly different poses then remap by the first-order update

    uv(pose + d) ~ uv(pose) + J @ d

instead of reprojecting, which is exact to O(|d|^2) and turns per-frame
projection updates into one tiny matmul per node.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from upsp_tpu.camera.model import CameraParams, project_points


class KeyframeMapping(NamedTuple):
    uv: jax.Array  # (N, 2) pixel positions at the keyframe pose
    jac: jax.Array  # (N, 2, 6) d(uv)/d[rvec, tvec]
    pose: jax.Array  # (6,) keyframe pose [rvec, tvec]


def _project_pose(pose6: jax.Array, params: CameraParams, pts: jax.Array):
    p = params._replace(rvec=pose6[:3], tvec=pose6[3:6])
    return project_points(p, pts)


@jax.jit
def keyframe_mapping(params: CameraParams, points: jax.Array) -> KeyframeMapping:
    """Project all points and differentiate w.r.t. the pose (forward mode)."""
    pose = jnp.concatenate([params.rvec, params.tvec])
    uv = _project_pose(pose, params, points)
    jac = jax.jacfwd(_project_pose)(pose, params, points)  # (N, 2, 6)
    return KeyframeMapping(uv=uv, jac=jac, pose=pose)


@jax.jit
def remap(mapping: KeyframeMapping, new_pose: jax.Array) -> jax.Array:
    """First-order pixel positions at a nearby pose: uv + J (pose' - pose)."""
    d = new_pose - mapping.pose
    return mapping.uv + jnp.einsum("nij,j->ni", mapping.jac, d)


@jax.jit
def remap_error_bound(mapping: KeyframeMapping, new_pose: jax.Array) -> jax.Array:
    """Cheap per-node staleness metric: |J d| in pixels (decide when to re-key)."""
    d = new_pose - mapping.pose
    return jnp.linalg.norm(jnp.einsum("nij,j->ni", mapping.jac, d), axis=-1)
