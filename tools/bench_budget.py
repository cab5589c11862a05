"""Honest component budget for the 1 MP headline program.

Re-derives BENCH_NOTES' per-frame component costs with the amortized
final-fetch methodology (tools/benchlib.py) — the round-2 numbers were
measured with ``block_until_ready``, which under-waits on this backend.

Variants of the production chunk program (fft init + unrolled GN ECC,
frame_batch=8) are timed whole; component costs fall out of differences
between variants, so every number is a real end-to-end delta, not an
isolated-op estimate.

Usage: python tools/bench_budget.py [--mp 1|2] [--frames 32]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax.numpy as jnp
import numpy as np

from benchlib import per_call_seconds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp", type=int, default=1, choices=(1, 2))
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--frame-batch", type=int, default=8)
    args = ap.parse_args()

    from upsp_tpu.pipeline.phase1 import make_chunk_processor
    from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

    hw = (1024, 1024) if args.mp == 1 else (1200, 1800)
    state = make_synthetic_state(
        n_cameras=1, image_hw=hw, grid_shape=(160, 128)
    )
    n_distinct = min(8, args.frames)
    distinct = make_frame_batch(state, n_distinct)
    base = np.tile(distinct, (-(-args.frames // n_distinct), 1, 1, 1))[
        : args.frames
    ]
    inputs = [jnp.asarray(base + i * 1e-3) for i in range(4)]
    F = args.frames

    def t(label, **kw):
        fn = make_chunk_processor(state, frame_batch=args.frame_batch, **kw)
        per = per_call_seconds(fn, inputs, r1=2, r2=6)
        print(
            f"{label:44s} {per/F*1e3:7.3f} ms/frame   {F/per:8.1f} fps",
            flush=True,
        )
        return per / F

    t_full = t("production (fft + 2 GN)", warm_start="fft", ecc_iters=2)
    t_gn3 = t("fft + 3 GN", warm_start="fft", ecc_iters=3)
    t_gn1 = t("fft + 1 GN", warm_start="fft", ecc_iters=1)
    t_gn0 = t("fft + 0 GN (init only + final warp)", warm_start="fft", ecc_iters=0)
    print(f"{'-> marginal GN step':44s} {(t_gn3-t_gn1)/2*1e3:7.3f} ms/frame")

    import dataclasses

    cfg_none = dataclasses.replace(state.config, registration="none")
    state_none = dataclasses.replace(state, config=cfg_none)
    fn = make_chunk_processor(state_none, frame_batch=args.frame_batch)
    per = per_call_seconds(fn, inputs, r1=2, r2=6)
    t_noreg = per / F
    print(
        f"{'no registration (hot+patch+filter+gather)':44s} "
        f"{t_noreg*1e3:7.3f} ms/frame   {F/per:8.1f} fps",
        flush=True,
    )
    print(f"{'-> registration total (incl final warp)':44s} "
          f"{(t_full-t_noreg)*1e3:7.3f} ms/frame")

    t_band = t("production, banded warps (band=8)",
               warm_start="fft", ecc_iters=2, ecc_band=8)
    print(f"{'-> banded vs dense delta':44s} {(t_band-t_full)*1e3:7.3f} ms/frame")


if __name__ == "__main__":
    main()
