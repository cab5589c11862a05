"""Ablation probe: where does the per-frame phase-1 time go?

Times the production chunk program with components switched off one at a
time (GN step count, registration entirely, patch/filter) so the fixed ECC
cost, the marginal GN-step cost, and the non-registration remainder can be
read off as differences.  Amortized final-fetch methodology (tools/
benchlib.py) — ``block_until_ready`` under-waits on this backend, see
BENCH_NOTES.md.

Usage: python tools/bench_ablate.py [--hw 1024,1024] [--cams 1] [--frames 32]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import per_call_seconds


def time_fn(fn, arg, reps=3):
    inputs = [arg, arg + 1e-3, arg + 2e-3]
    return per_call_seconds(fn, inputs, r1=2, r2=6, trials=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1024,1024")
    ap.add_argument("--grid", default="160,128")
    ap.add_argument("--cams", type=int, default=1)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--frame-batch", type=int, default=8)
    args = ap.parse_args()

    H, W = map(int, args.hw.split(","))
    gi, gj = map(int, args.grid.split(","))
    F, C = args.frames, args.cams

    from upsp_tpu.pipeline.phase1 import make_chunk_processor
    from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

    state = make_synthetic_state(n_cameras=C, image_hw=(H, W), grid_shape=(gi, gj))
    frames = make_frame_batch(state, F)
    fr_dev = jax.block_until_ready(jnp.asarray(frames))
    print(f"{C} cams x {H}x{W}, {state.model.size} nodes, {F} frames", flush=True)

    def mk(**kw):
        return make_chunk_processor(
            state, warm_start="fft", frame_batch=args.frame_batch, **kw
        )

    variants = [
        ("production (fft + 2 GN)", dict(ecc_iters=2)),
        ("fft + 4 GN", dict(ecc_iters=4)),
        ("fft + 0 GN (init+final warp only)", dict(ecc_iters=0)),
    ]
    results = {}
    for name, kw in variants:
        t = time_fn(mk(**kw), fr_dev)
        results[name] = t
        print(f"{name:40s} {t*1e3:7.1f} ms  {F/t:8.1f} fps", flush=True)

    # registration off entirely (patch+filter+project remainder) — same
    # frame_batch as the ECC variants so the derived differences compare
    # like-for-like batching regimes (frame_batch sweeps show ~15% fps shift)
    import dataclasses
    cfg2 = dataclasses.replace(state.config, registration="none")
    state2 = dataclasses.replace(state, config=cfg2)
    t = time_fn(
        make_chunk_processor(
            state2, warm_start=False, frame_batch=args.frame_batch
        ),
        fr_dev,
    )
    results["no registration"] = t
    print(f"{'no registration (patch+filter+proj)':40s} {t*1e3:7.1f} ms  {F/t:8.1f} fps",
          flush=True)

    t2, t4 = results["production (fft + 2 GN)"], results["fft + 4 GN"]
    t0gn = results["fft + 0 GN (init+final warp only)"]
    step = (t4 - t2) / 2 / F * 1e3
    fixed = (t0gn - results["no registration"]) / F * 1e3
    print(f"\nper-frame marginal GN step : {step:.3f} ms")
    print(f"per-frame ECC fixed (fft init + final warp + blur): {fixed:.3f} ms")
    print(f"per-frame non-registration remainder: "
          f"{results['no registration']/F*1e3:.3f} ms")


if __name__ == "__main__":
    main()
