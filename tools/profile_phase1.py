"""Device op-level profile of the production 1 MP chunk program.

Captures a jax.profiler trace of several pipelined chunk dispatches on the
real chip and prints the per-HLO-op time breakdown (via xprof's xplane
parser) — the attribution tool behind the per-pass efficiency work: it names
the actual copies/fusions/convert ops XLA emitted, where ablation only
brackets them.

Usage: python tools/profile_phase1.py [--dtype float32] [--frames 32]
       [--mode fft] [--hw 1024,1024] [--cams 1] [--grid 160,128] [--top 40]
"""

import argparse
import glob
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import run_stream


def capture(fn, inputs, reps, logdir):
    run_stream(fn, inputs, 2)  # compile/warmup outside the trace
    with jax.profiler.trace(logdir):
        run_stream(fn, inputs, reps)


def xplane_op_table(logdir):
    """[(op_name, self_us, category)] from the captured xplane, descending."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane under {logdir}")
    path = max(paths, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rd

    data, _ = rd.xspace_to_tool_data([path], "framework_op_stats", {})
    import gzip
    import io
    import csv

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    rows = list(csv.DictReader(io.StringIO(data)))
    if rows:
        return rows
    # newer xprof emits gviz JSON ({"cols": [...], "rows": [{"c": [...]}]})
    import json

    tables = json.loads(data)
    if isinstance(tables, dict):
        tables = [tables]
    # the tool emits the same op table more than once (combined + per-device
    # views with identical content) — parse only the FIRST table or every op
    # double-counts
    out = []
    for tb in tables:
        if not isinstance(tb, dict) or "cols" not in tb:
            continue
        labels = [c.get("label") or c.get("id") for c in tb["cols"]]
        for r in tb.get("rows", []):
            out.append(
                {lab: cell.get("v") for lab, cell in zip(labels, r["c"])}
            )
        if out:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1024,1024")
    ap.add_argument("--grid", default="160,128")
    ap.add_argument("--cams", type=int, default=1)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--frame-batch", type=int, default=8)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--mode", default="fft")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    H, W = map(int, args.hw.split(","))
    gi, gj = map(int, args.grid.split(","))

    from upsp_tpu.pipeline.phase1 import make_chunk_processor
    from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

    # share bench_fullconfig's state cache (the 4-cam 2 MP state costs
    # ~16 min of host time)
    cache = f"/root/state_cache_{args.cams}x{H}x{W}_{gi}x{gj}.pkl"
    if os.path.exists(cache):
        import pickle

        with open(cache, "rb") as fh:
            state = pickle.load(fh)
        print(f"state loaded from {cache}", flush=True)
    else:
        state = make_synthetic_state(
            n_cameras=args.cams, image_hw=(H, W), grid_shape=(gi, gj)
        )
    n_distinct = min(8, args.frames)
    distinct = make_frame_batch(state, n_distinct)
    reps_tile = -(-args.frames // n_distinct)
    base = np.tile(distinct, (reps_tile, 1, 1, 1))[: args.frames]
    inputs = [jnp.asarray(base + i * 1e-3) for i in range(3)]

    warm = {"fft": "fft", "scan": True, "cold": False}[args.mode]
    fn = make_chunk_processor(
        state,
        warm_start=warm,
        frame_batch=args.frame_batch if args.mode == "fft" else 1,
        compute_dtype=args.dtype,
    )

    logdir = args.logdir or tempfile.mkdtemp(prefix="upsp_prof_")
    capture(fn, inputs, args.reps, logdir)
    rows = xplane_op_table(logdir)
    # normalize column names across plugin versions
    def col(r, *names):
        for n in names:
            if n in r:
                return r[n]
        return ""

    if rows and not any(
        k for k in rows[0] if "self" in k.lower() and "time" in k.lower()
    ):
        print("columns:", sorted(rows[0].keys()))
    def selftime(r):
        for k, v in r.items():
            kl = k.lower()
            if ("self" in kl and "time" in kl and "avg" not in kl
                    and "%" not in kl):
                try:
                    return float(v)
                except (TypeError, ValueError):
                    continue
        return 0.0

    rows = [
        (
            col(r, "Operation", "operation", "Operation Name", "Op name"),
            selftime(r),
            col(r, "Type", "type", "Operation Type", "Category", "category"),
        )
        for r in rows
        if col(r, "Host/device", "host_or_device") in ("", "Device")
    ]
    rows.sort(key=lambda t: -t[1])
    total = sum(t[1] for t in rows)
    if total == 0:
        raise RuntimeError("no self-time parsed; check columns above")
    per_frame_us = total / (args.reps * args.frames)
    print(f"total device self-time {total/1e3:.2f} ms over "
          f"{args.reps} chunks x {args.frames} frames "
          f"=> {per_frame_us:.1f} us/frame  ({1e6/per_frame_us:.0f} fps)",
          flush=True)
    print(f"{'op':70s} {'us/frame':>9s} {'%':>6s}  type")
    for name, us, cat in rows[: args.top]:
        pf = us / (args.reps * args.frames)
        print(f"{name[:70]:70s} {pf:9.2f} {100*us/total:6.2f}  {cat}")
    print(f"\ntrace dir: {logdir}")


if __name__ == "__main__":
    main()
