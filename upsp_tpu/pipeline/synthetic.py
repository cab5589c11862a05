"""Synthetic scenes for benchmarks, the graft entry point, and dry runs.

Builds a fully deterministic Phase0State without file IO or BVH work: a flat
plate viewed by pinhole cameras, with analytically computed node->pixel
projections and a handful of patch clusters.  The per-frame compute exercised
is exactly the production phase-1 program (ECC registration, patching, filter,
gather-projection); only the phase-0 *construction* is shortcut.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from upsp_tpu.camera.model import CameraParams, make_camera_params
from upsp_tpu.io.plot3d import StructGrid
from upsp_tpu.geometry.grids import from_struct_grid
from upsp_tpu.ops.patching import build_patch_clusters, build_patch_operator
from upsp_tpu.ops.projection import (
    NodeProjection,
    identify_skipped_nodes,
)
from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
from upsp_tpu.pipeline.phase0 import Phase0State


def make_plate_grid(imax: int, jmax: int, lx: float = 10.0, ly: float = 8.0):
    xs = np.linspace(0, lx, imax)
    ys = np.linspace(0, ly, jmax)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    g = StructGrid()
    g.sz = [np.array([imax, jmax, 1], np.int32)]
    g.x = gx.ravel().astype(np.float32)
    g.y = gy.ravel().astype(np.float32)
    g.z = np.zeros(imax * jmax, np.float32)
    g.zones = np.zeros(imax * jmax, np.int32)
    return g


def make_synthetic_state(
    n_cameras: int = 1,
    image_hw: Tuple[int, int] = (1024, 1024),
    grid_shape: Tuple[int, int] = (160, 128),
    n_patch_dots: int = 12,
    registration: str = "pixel",
    filter_type: str = "gaussian",
    seed: int = 0,
    overlap: str = "best_view",
) -> Phase0State:
    """Deterministic flagship scene: plate grid + overhead camera(s).

    ``overlap`` mirrors the deck option (reference default BestView,
    upsp_inputs.h: each node sources from exactly ONE camera — the one
    viewing it least obliquely).  "best_view" assigns each node to the
    camera whose projection lands nearest its principal point (the
    synthetic analog of the obliqueness criterion), which is what the
    production phase-1 fast path (combined gather + fused warp+filter
    tail) keys on; "average_view" keeps every camera's weight positive
    (the reference's AverageViews functor), exercising the per-camera
    gather-and-sum path.  Until round 5 this builder always produced
    average-view weights, so multi-camera benchmarks measured the slow
    path against a best_view config."""
    H, W = image_hw
    imax, jmax = grid_shape
    rng = np.random.default_rng(seed)
    grid = make_plate_grid(imax, jmax)
    model = from_struct_grid(grid, tolerance=0.0)
    n = model.size

    cam_z = 20.0
    margin = 0.86
    fx = min(W, H) * cam_z / 12.0 * margin

    cfg = ProcessingConfig(
        test_id="synthetic-bench",
        cameras=[CameraInputs(number=c + 1) for c in range(n_cameras)],
        registration=registration,
        filter=filter_type,
        filter_size=3,
        target_patcher="polynomial",
    )

    cam_params: List[CameraParams] = []
    projections: List[NodeProjection] = []
    patch_ops = []
    ref_frames = []
    for c in range(n_cameras):
        # cameras slightly offset so multi-camera runs differ per camera
        cx_world = 5.0 + 0.4 * c
        rmat = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        tvec = np.array([-cx_world, 4.0, cam_z])
        K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
        params = make_camera_params(rmat, tvec, K, np.zeros(5), dtype=jnp.float32)
        cam_params.append(params)

        u = W / 2 + fx * (grid.x - cx_world) / cam_z
        v = H / 2 - fx * (grid.y - 4.0) / cam_z
        visible = (u >= 0) & (u < W) & (v >= 0) & (v < H)
        col = np.clip(np.rint(u), 0, W - 1).astype(np.int32)
        row = np.clip(np.rint(v), 0, H - 1).astype(np.int32)
        projections.append(
            NodeProjection(
                pixel_index=jnp.asarray(np.where(visible, row * W + col, 0)),
                # provisional equal weights; resolved to the overlap policy
                # below once every camera's projection exists
                weight=jnp.asarray(
                    (visible / max(n_cameras, 1)).astype(np.float32)
                ),
                u=jnp.asarray((u / W).astype(np.float32)),
                v=jnp.asarray((v / H).astype(np.float32)),
                visible=jnp.asarray(visible),
            )
        )

        dots = rng.uniform([0.08 * W, 0.08 * H], [0.92 * W, 0.92 * H],
                           size=(n_patch_dots, 2))
        diam = rng.uniform(4.0, 8.0, n_patch_dots)
        clusters = build_patch_clusters(dots, diam, image_hw, 3, 2)
        patch_ops.append(build_patch_operator(clusters, image_hw))

        ref = make_reference_frame(image_hw, seed=seed + c)
        ref_frames.append(ref)

    if overlap == "best_view" and n_cameras > 1:
        # BestView: each node's weight concentrates on the camera seeing it
        # most centrally (stand-in for the reference's obliqueness rule);
        # exactly one positive weight per node — the production fast-path
        # contract (phase1.phase1_params combined gather)
        uu = np.stack([np.asarray(p.u) for p in projections])  # (C, N)
        vv = np.stack([np.asarray(p.v) for p in projections])
        vis = np.stack([np.asarray(p.visible) for p in projections])
        offc = np.hypot(uu - 0.5, vv - 0.5)
        offc[~vis] = np.inf
        best = offc.argmin(axis=0)  # (N,)
        any_vis = vis.any(axis=0)
        for c in range(n_cameras):
            w = ((best == c) & any_vis).astype(np.float32)
            projections[c] = projections[c]._replace(weight=jnp.asarray(w))
    cfg.overlap = overlap
    skipped = identify_skipped_nodes(projections)
    return Phase0State(
        model=model,
        bvh=None,
        bvh_dev=None,
        cam_params=cam_params,
        projections=projections,
        skipped=skipped,
        patch_ops=patch_ops,
        ref_frames=jnp.asarray(np.stack(ref_frames)),
        superseded_by=jnp.asarray(model.superseded_by),
        image_hw=image_hw,
        config=cfg,
    )


def make_reference_frame(image_hw: Tuple[int, int], seed: int = 0) -> np.ndarray:
    """Textured, well-lit 12-bit-ish frame (ECC needs gradients everywhere)."""
    H, W = image_hw
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 1800 + 0.9 * xx + 0.7 * yy
    for _ in range(24):
        cx, cy = rng.uniform(0, W), rng.uniform(0, H)
        s = rng.uniform(W / 40, W / 8)
        img += rng.uniform(120, 600) * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)
        )
    img += rng.normal(0, 6.0, (H, W))
    return np.clip(img, 0, 4095).astype(np.float32)


def _subpixel_shift(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Bilinear sub-pixel translation with edge replication (host-side)."""
    H, W = img.shape
    ix, fx = int(np.floor(dx)), dx - np.floor(dx)
    iy, fy = int(np.floor(dy)), dy - np.floor(dy)
    pad = max(abs(ix) + 1, abs(iy) + 1)
    p = np.pad(img, pad, mode="edge")
    y0 = pad + iy
    x0 = pad + ix
    a = p[y0 : y0 + H, x0 : x0 + W]
    b = p[y0 : y0 + H, x0 + 1 : x0 + 1 + W]
    c = p[y0 + 1 : y0 + 1 + H, x0 : x0 + W]
    d = p[y0 + 1 : y0 + 1 + H, x0 + 1 : x0 + 1 + W]
    return (
        a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx)
        + d * fy * fx
    ).astype(np.float32)


def make_frame_batch(
    state: Phase0State, n_frames: int, jitter_px: float = 0.6, seed: int = 1
) -> np.ndarray:
    """(F, C, H, W) stack: reference frame with *sub-pixel* shifts + gain wobble.

    True sub-pixel translations (bilinear resample) make the registration work
    honest — integer rolls would let ECC converge in one step.
    """
    H, W = state.image_hw
    rng = np.random.default_rng(seed)
    ref = np.array(state.ref_frames)  # (C, H, W)
    frames = np.empty((n_frames, ref.shape[0], H, W), np.float32)
    for f in range(n_frames):
        for c in range(ref.shape[0]):
            dx, dy = rng.normal(0, jitter_px, 2)
            shifted = _subpixel_shift(ref[c], dx, dy)
            frames[f, c] = shifted * (1.0 + 0.01 * np.sin(2 * np.pi * f / 37))
    return frames
