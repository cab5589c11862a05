"""Phase-0 diagnostic images (per camera), matching the reference's outputs.

Table parity: docs/md/upsp-user-manual.md:827-836 / psp_process.cpp
InitializeCameraCalibration + InitializeImagePatches diagnostics:

  camNN-8bit-raw.png                scaled first frame
  camNN-raw.exr                     float32 first frame
  camNN-8bit-projected-fiducials.png  visible fiducials overlay
  camNN-8bit-fiducial-clusters.png    clusters colored
  camNN-8bit-cluster-boundaries.png   boundary rings overlay
  camNN-nodecount.png               nodes-per-pixel colormap
  camNN-uv                          per-node normalized (u,v) flat file
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from upsp_tpu.ops.image import convert_to_8u

# nodes-per-pixel colormap (BGR like the reference's cv_extras.cpp:277-289):
# 0=black, 1=green, 2=yellow, 3=orange, 4=light orange, >=5 white
_NODECOUNT_COLORS = np.array(
    [
        [0, 0, 0],
        [0, 255, 0],
        [0, 255, 255],
        [51, 153, 255],
        [153, 204, 255],
    ],
    np.uint8,
)


def nodes_per_pixel_image(counts: np.ndarray) -> np.ndarray:
    """uint8 BGR colormap of node counts per pixel."""
    c = np.clip(np.asarray(counts), 0, 255).astype(np.int64)
    out = np.full(c.shape + (3,), 255, np.uint8)
    for v in range(_NODECOUNT_COLORS.shape[0]):
        out[c == v] = _NODECOUNT_COLORS[v]
    return out


def nodes_per_pixel_counts(pixel_index: np.ndarray, visible: np.ndarray,
                           image_hw) -> np.ndarray:
    H, W = image_hw
    counts = np.zeros(H * W, np.int64)
    np.add.at(counts, np.asarray(pixel_index)[np.asarray(visible)], 1)
    return counts.reshape(H, W)


def add_targets_overlay(
    img8: np.ndarray,
    centers: np.ndarray,
    color=(0, 255, 0),
    labels: Optional[Sequence[str]] = None,
    radius: int = 4,
) -> np.ndarray:
    """Draw circles (+ optional labels) over a grayscale/BGR image -> BGR."""
    import cv2

    img8 = np.asarray(img8, np.uint8)
    out = (
        img8.copy()
        if img8.ndim == 3
        else cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)
    )
    for i, (x, y) in enumerate(np.atleast_2d(centers)):
        cv2.circle(out, (int(round(x)), int(round(y))), radius, color, 1)
        if labels is not None:
            cv2.putText(
                out, str(labels[i]), (int(x) + 5, int(y) - 5),
                cv2.FONT_HERSHEY_PLAIN, 0.8, color, 1,
            )
    return out


def write_phase0_diagnostics(state, out_dir: str) -> None:
    """Emit the standard per-camera diagnostic set from a Phase0State."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    ref = np.asarray(state.ref_frames)
    for c in range(state.n_cameras):
        prefix = os.path.join(out_dir, f"cam{c + 1:02d}-")
        img8 = convert_to_8u(ref[c])
        cv2.imwrite(prefix + "8bit-raw.png", img8)
        try:
            cv2.imwrite(prefix + "raw.exr", ref[c].astype(np.float32))
        except cv2.error:
            # OpenCV built without OpenEXR: keep the float image as raw f32
            ref[c].astype("<f4").tofile(prefix + "raw.f32")

        proj = state.projections[c]
        counts = nodes_per_pixel_counts(
            np.asarray(proj.pixel_index), np.asarray(proj.visible), state.image_hw
        )
        cv2.imwrite(prefix + "nodecount.png", nodes_per_pixel_image(counts))

        uv = np.stack([np.asarray(proj.u), np.asarray(proj.v)], axis=1)
        uv.astype("<f4").ravel().tofile(prefix + "uv")

        # per-camera coverage: this camera's projection weight per node
        # (the reference sketches these datasets but leaves them commented
        # out; cheap here — one all-ones projection per camera)
        from upsp_tpu.ops.projection import coverage as _coverage

        cam_cov = np.asarray(_coverage([proj], *state.image_hw))
        cam_cov.astype("<f4").tofile(prefix + "coverage")

        diag = (
            state.patch_diags[c]
            if getattr(state, "patch_diags", None) is not None
            else None
        )
        if diag is not None:
            # projected fiducial positions, labeled green (psp_process.cpp:
            # 2113-2116)
            fid_img = add_targets_overlay(
                img8, diag["uv"], color=(0, 255, 0), labels=diag["names"]
            )
            cv2.imwrite(prefix + "8bit-projected-fiducials.png", fid_img)
            # clusters in distinct colors, unlabeled (:2136-2145)
            cl = np.asarray(diag["cluster_of"])
            n_cl = int(cl.max()) + 1 if cl.size else 0
            cimg = cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)
            rng_colors = [
                tuple(int(v) for v in col)
                for col in np.random.default_rng(0).integers(
                    64, 255, size=(max(n_cl, 1), 3)
                )
            ]
            for gi in range(n_cl):
                cimg = add_targets_overlay(
                    cimg, diag["uv"][cl == gi], color=rng_colors[gi]
                )
            cv2.imwrite(prefix + "8bit-fiducial-clusters.png", cimg)

        op = state.patch_ops[c]
        if op is not None:
            H, W = state.image_hw
            bimg = cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)
            b_idx = np.asarray(op.boundary_idx).ravel()
            i_idx = np.asarray(op.internal_idx).ravel()
            i_idx = i_idx[i_idx < H * W]
            bimg[i_idx // W, i_idx % W] = (0, 255, 255)
            bimg[b_idx // W, b_idx % W] = (255, 0, 0)
            cv2.imwrite(prefix + "8bit-cluster-boundaries.png", bimg)


# -- registration telemetry analysis ------------------------------------------

def read_registration_telemetry(path: str, n_cameras: int) -> np.ndarray:
    """Load the ``registration`` flat file written by run_datapoint
    (registration_telemetry=True) back into (F, C, 4) [rho, iters, tx, ty]."""
    raw = np.fromfile(path, "<f4")
    return raw.reshape(-1, n_cameras, 4)


def analyze_registration_telemetry(
    telemetry: np.ndarray,
    max_iters: int = 50,
    epsilon: float = 1e-3,
) -> dict:
    """Per-camera ECC convergence report + tuning recommendations.

    Turns the free per-frame record into the adaptive-parameter policy the
    reference leaves to the operator: if the iteration budget saturates,
    relax epsilon (the sequence is noisy and late iterations buy nothing);
    if convergence is immediate, tighten epsilon to bank accuracy headroom.
    Frames whose correlation drops far below the sequence trend are flagged
    for inspection (lamp flicker, a skipped frame, model strike).
    """
    tele = np.asarray(telemetry, np.float64)
    F, C, _ = tele.shape
    cameras = []
    for c in range(C):
        rho = tele[:, c, 0]
        iters = tele[:, c, 1]
        shift = np.hypot(tele[:, c, 2], tele[:, c, 3])
        p95 = float(np.percentile(iters, 95))
        rec_iters = int(np.clip(np.ceil(p95 * 1.25), 5, max_iters))
        if p95 >= max_iters:
            rec_eps = epsilon * 3.0  # budget-bound: stop earlier
        elif float(iters.mean()) <= 2.0:
            rec_eps = epsilon / 3.0  # converges instantly: ask for more
        else:
            rec_eps = epsilon
        mu, sd = float(rho.mean()), float(rho.std())
        suspect = np.nonzero(rho < mu - 4.0 * max(sd, 1e-6))[0]
        cameras.append(
            {
                "rho_min": float(rho.min()),
                "rho_mean": mu,
                "iters_mean": float(iters.mean()),
                "iters_p95": p95,
                "iters_max": int(iters.max()),
                "shift_max_px": float(shift.max()),
                "recommended_max_iters": rec_iters,
                "recommended_epsilon": float(rec_eps),
                "suspect_frames": suspect.tolist(),
            }
        )
    return {"n_frames": F, "cameras": cameras}
