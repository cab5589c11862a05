"""Benchmark: frames/sec/chip for the fused register+patch+filter+project step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context: the reference (C++/OpenCV psp_process, SURVEY.md section 6)
publishes no frames/s numbers; BASELINE.md's derived anchor is the per-frame
cost of cv::findTransformECC + patch + blur + sparse project on a Xeon core.
``vs_baseline`` reports against a measured single-core OpenCV equivalent of
the same per-frame pipeline at the same sizes (computed here on the fly when
cv2 is available, else against a recorded constant).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Run on the real TPU when present (do NOT force cpu here).
import jax
import jax.numpy as jnp
import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "32"))
IMAGE_HW = (1024, 1024)  # 1 MP
GRID_SHAPE = (160, 128)  # ~20k nodes

# measured single-core OpenCV reference pipeline (cv::findTransformECC 50-iter
# cap + polynomial patching + GaussianBlur + SpMV) at 1 MP on this host's CPU;
# recomputed live when cv2 import succeeds
FALLBACK_REFERENCE_FPS = 1.1


def _bench_inputs():
    """Synthetic state + device-resident frame buffers (built once)."""
    from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

    state = make_synthetic_state(
        n_cameras=1, image_hw=IMAGE_HW, grid_shape=GRID_SHAPE
    )
    # host-side synthesis is ~6 s/frame at 1 MP (bilinear sub-pixel jitter on
    # 2 cores); tile 8 distinct jittered frames to N_FRAMES — per-frame device
    # work (ECC iterations on distinct sub-pixel shifts) is unchanged
    n_distinct = min(8, N_FRAMES)
    distinct = make_frame_batch(state, n_distinct)
    reps_tile = -(-N_FRAMES // n_distinct)
    base = np.tile(distinct, (reps_tile, 1, 1, 1))[:N_FRAMES]
    # distinct device buffers per rep so no tunnel/runtime layer can dedupe
    # repeated identical dispatches
    inputs = [jnp.asarray(base + i * 1e-3) for i in range(4)]
    return state, inputs


def bench_tpu(state, inputs, compute_dtype: str = "float32") -> float:
    from upsp_tpu.pipeline.phase1 import make_chunk_processor

    # production shape (the run_datapoint default): phase-correlation ECC
    # init + 2 fixed Gauss-Newton steps, vmapped 8 frames per step —
    # deterministic across shardings and dense on device.
    # BENCH_MODE overrides: fft (default) | scan | cold.
    mode = os.environ.get("BENCH_MODE", "fft")
    warm = {"fft": "fft", "scan": True, "cold": False}[mode]
    batch_fn = make_chunk_processor(
        state,
        warm_start=warm,
        frame_batch=int(os.environ.get("BENCH_FRAME_BATCH", "8")) if mode == "fft" else 1,
        compute_dtype=compute_dtype,
    )

    # Amortized final-fetch differencing (tools/benchlib.py): on this
    # tunneled backend block_until_ready under-waits (measured: a 1024-pass
    # fori_loop over 34 MB "completes" in 0.1 ms) and a device->host fetch
    # costs a ~25 ms round trip.  Dispatch R chunks (the TPU stream executes
    # in order, so fetching the LAST output forces all R) and difference two
    # rep counts so fetch/dispatch overhead cancels — also the production-
    # representative number, since the streaming driver pipelines chunks.
    def run_stream(reps: int) -> float:
        out = None
        for i in range(reps):
            out = batch_fn(inputs[i % len(inputs)])
        return float(np.asarray(out.ravel()[0]))

    run_stream(2)  # warmup / compile
    r1, r2 = 2, 8
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_stream(r1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_stream(r2)
        t2 = time.perf_counter() - t0
        trials.append((t2 - t1) / (r2 - r1))
    # per-trial fps band, ascending — the band classifies run-to-run chip
    # variance vs real regressions when comparing across rounds
    return sorted(N_FRAMES / t for t in trials)


def bench_reference_cpu(n_frames: int = 2) -> float:
    """Single-core OpenCV pipeline equivalent (the reference's per-frame work)."""
    try:
        import cv2
    except ImportError:
        return FALLBACK_REFERENCE_FPS
    cv2.setNumThreads(1)
    from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

    state = make_synthetic_state(
        n_cameras=1, image_hw=IMAGE_HW, grid_shape=GRID_SHAPE
    )
    ref = np.array(state.ref_frames[0])
    frames = make_frame_batch(state, n_frames)[:, 0]
    pix = np.array(state.projections[0].pixel_index)
    w = np.array(state.projections[0].weight)

    t0 = time.perf_counter()
    for f in range(n_frames):
        img = frames[f]
        warp = np.eye(2, 3, dtype=np.float32)
        try:
            cv2.findTransformECC(
                ref, img, warp, cv2.MOTION_AFFINE,
                (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 50, 1e-3),
            )
        except cv2.error:
            pass
        img = cv2.warpAffine(
            img, warp, (img.shape[1], img.shape[0]),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        )
        img = cv2.GaussianBlur(img, (3, 3), 0)
        _ = img.ravel()[pix] * w
    dt = time.perf_counter() - t0
    return n_frames / dt


def main() -> None:
    state, inputs = _bench_inputs()
    # headline = the production DEFAULT (f32 images — reference-parity mode);
    # the bf16 opt-in (vv-parity locked on real fixture imagery,
    # tests/test_fixture_e2e.py::test_bf16_compute_dtype_vv_parity) is
    # measured alongside and reported as an extra key.  BENCH_DTYPE pins a
    # single dtype for ad-hoc runs.
    pinned = os.environ.get("BENCH_DTYPE")
    band = bench_tpu(state, inputs, compute_dtype=pinned or "float32")
    fps = band[len(band) // 2]  # median trial: stable against one-off stalls
    band_bf16 = (
        None if pinned else bench_tpu(state, inputs, compute_dtype="bfloat16")
    )
    try:
        ref_fps = bench_reference_cpu()
    except Exception:
        ref_fps = FALLBACK_REFERENCE_FPS
    rec = {
        "metric": "frames_per_sec_per_chip_register_project_1MP",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / max(ref_fps, 1e-9), 3),
        # run-to-run band over the 3 timing trials (chip variance ~5%):
        # deltas inside the band are noise, outside are real
        "trial_fps_min": round(band[0], 3),
        "trial_fps_max": round(band[-1], 3),
    }
    if band_bf16 is not None:
        rec["bf16_optin_fps"] = round(band_bf16[len(band_bf16) // 2], 3)
        rec["bf16_trial_fps_min"] = round(band_bf16[0], 3)
        rec["bf16_trial_fps_max"] = round(band_bf16[-1], 3)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
