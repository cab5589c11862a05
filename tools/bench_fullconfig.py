"""Full-run-config benchmark: 4 cameras x 2 MP x 1M nodes, end to end on chip.

Measures the production chunk program (phase 1 fused register/patch/filter/
project) plus the frames->nodes transpose + phase-2 conversion, device-
resident (host ingest measured separately; the tunnel link is not
representative — BENCH_NOTES.md).

Usage: python tools/bench_fullconfig.py [--mode fft|scan|cold] [--frames 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fft", choices=["fft", "scan", "cold"])
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--cams", type=int, default=4)
    ap.add_argument("--hw", default="1200,1800")  # 2.16 MP
    ap.add_argument("--grid", default="1024,1024")  # ~1.05M nodes
    ap.add_argument("--frame-batch", type=int, default=8)
    ap.add_argument("--ecc-iters", type=int, default=None,
                    help="fine GN steps (default: production 2 full-res, 0 coarse)")
    ap.add_argument("--ecc-coarse-iters", type=int, default=None)
    ap.add_argument("--phase1-only", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--no-slab", action="store_true",
                    help="disable the Pallas slab projection gather")
    ap.add_argument("--no-vmap-cameras", action="store_true",
                    help="force the per-camera Python loop path")
    ap.add_argument("--json-out", default=None,
                    help="write the measured record (t_frame_ms, fps, "
                         "config, command) to this JSON file — the artifact "
                         "bench_scaling_model.py consumes")
    args = ap.parse_args()

    H, W = map(int, args.hw.split(","))
    gi, gj = map(int, args.grid.split(","))
    F, C = args.frames, args.cams

    from upsp_tpu.pipeline.phase1 import make_chunk_processor, phase1_statistics
    from upsp_tpu.pipeline.synthetic import make_synthetic_state

    t0 = time.time()
    # the 4-cam 2 MP 1M-node state costs ~16 min of host time on 2 CPUs
    # (patch-operator builds); cache it on disk so perf iteration is not
    # bound by state construction (cache key = the shape-defining args)
    cache = f"/root/state_cache_{C}x{H}x{W}_{gi}x{gj}.pkl"
    if os.path.exists(cache):
        import pickle

        with open(cache, "rb") as fh:
            state = pickle.load(fh)
        print(f"state loaded from {cache}", flush=True)
    else:
        state = make_synthetic_state(
            n_cameras=C, image_hw=(H, W), grid_shape=(gi, gj)
        )
        import pickle

        try:
            with open(cache, "wb") as fh:
                pickle.dump(state, fh)
        except Exception as e:  # cache is best-effort
            print(f"state cache write failed: {e}", flush=True)
    n_nodes = state.model.size
    print(f"state built: {C} cams x {H}x{W} ({H*W/1e6:.2f} MP), "
          f"{n_nodes/1e6:.2f}M nodes [{time.time()-t0:.1f}s]", flush=True)

    warm = {"fft": "fft", "scan": True, "cold": False}[args.mode]
    fn = make_chunk_processor(
        state,
        warm_start=warm,
        frame_batch=args.frame_batch if args.mode == "fft" else 1,
        ecc_iters=args.ecc_iters if args.mode == "fft" else None,
        ecc_coarse_iters=args.ecc_coarse_iters if args.mode == "fft" else None,
        compute_dtype=args.compute_dtype,
        vmap_cameras=False if args.no_vmap_cameras else None,
        slab_gather=False if args.no_slab else None,
    )
    slab_plan = getattr(fn, "slab_plan", None)
    print(f"slab gather: {'ON (%d tiles, %.2fx slots)' % (slab_plan.n_tiles, slab_plan.n_slots / n_nodes) if slab_plan is not None else 'off'}",
          flush=True)

    # synthetic frames: base scene + per-frame sub-pixel shifts via roll of an
    # upsampled pattern is too slow on 2 host cores at 2 MP; use integer
    # rolls + intensity modulation (ECC still does full solves)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (
        2000
        + 0.5 * xx
        + 0.3 * yy
        + 400 * np.sin(xx / 37.0) * np.cos(yy / 29.0)
    ).astype(np.float32)
    frames = np.empty((F, C, H, W), np.float32)
    for f in range(F):
        sh = rng.integers(-2, 3, 2)
        img = np.roll(base, tuple(sh), axis=(0, 1))
        frames[f] = img[None] * (1 + 0.01 * np.sin(2 * np.pi * f / 7))
    fr_dev = jnp.asarray(frames)

    def full_step(fr):
        out = fn(fr)
        sols = out[0] if isinstance(out, tuple) else out
        return sols

    # amortized final-fetch differencing (tools/benchlib.py): on this
    # tunneled backend block_until_ready under-waits and a fetch costs a
    # ~25 ms round trip; two distinct device buffers defeat dedupe.
    from benchlib import per_call_seconds

    t0 = time.time()
    sols = full_step(fr_dev)
    float(np.asarray(sols.ravel()[0]))
    print(f"phase1 compile+run: {time.time()-t0:.1f}s", flush=True)
    inputs = [fr_dev, jnp.asarray(frames + 0.25)]
    t1 = per_call_seconds(full_step, inputs, r1=1, r2=4, trials=args.reps)
    print(f"phase1: {t1*1e3:.0f} ms / {F} frames = {F/t1:.1f} frames/s/chip",
          flush=True)
    t_fin = None
    if slab_plan is not None:
        # host unpermute cost (overlaps device compute in the driver; on
        # this 2-CPU host it is reported, not added to the device fps)
        from upsp_tpu.ops.pallas_gather import finalize_host
        sols_np = np.asarray(sols)
        t0 = time.perf_counter()
        _ = finalize_host(slab_plan, sols_np, fn.skipped_eff)
        t_fin = (time.perf_counter() - t0) / F
        print(f"host finalize (np.take): {t_fin*1e3:.2f} ms/frame "
              f"(overlapped in the driver)", flush=True)

    t2 = None
    if not args.phase1_only:
        from benchlib import force_fetch

        from upsp_tpu.ops.polyfit import detrend, make_detrender

        det = make_detrender(F, 6)

        @jax.jit
        def phase2_like(sols):
            avg, rms = phase1_statistics(sols)
            ratio = avg[None, :] / jnp.where(sols == 0, 1.0, sols) - 1.0
            node_major = ratio.T  # the all-to-all on a mesh; transpose here
            dcp = detrend(det, node_major) * 1.7 * 144.0 / 350.0
            return dcp, avg, rms

        t0 = time.time()
        force_fetch(phase2_like(sols))
        print(f"phase2 compile+run: {time.time()-t0:.1f}s", flush=True)
        sols2 = full_step(inputs[1])
        t2 = per_call_seconds(
            phase2_like, [sols, sols2], r1=1, r2=4, trials=args.reps
        )
        print(f"phase2: {t2*1e3:.0f} ms", flush=True)
        total = t1 + t2
        print(f"END2END: {F/total:.1f} frames/s/chip "
              f"({total*1e3:.0f} ms / {F} frames)", flush=True)

    if args.json_out:
        import json

        rec = {
            "config": {
                "cams": C, "hw": [H, W], "mp": round(H * W / 1e6, 3),
                "nodes": int(n_nodes), "frames": F, "mode": args.mode,
                "frame_batch": args.frame_batch,
                "compute_dtype": args.compute_dtype,
                "slab_gather": slab_plan is not None,
            },
            "t_frame_ms_phase1": round(t1 * 1e3 / F, 4),
            "fps_phase1": round(F / t1, 2),
            "command": " ".join(sys.argv),
        }
        if t_fin is not None:
            rec["host_finalize_ms_per_frame"] = round(t_fin * 1e3, 3)
        if t2 is not None:
            rec["t_phase2_ms_per_chunk"] = round(t2 * 1e3, 2)
            rec["t_frame_ms_end2end"] = round((t1 + t2) * 1e3 / F, 4)
            rec["fps_end2end"] = round(F / (t1 + t2), 2)
        with open(args.json_out, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
