"""Communication model for multi-chip scaling of the production pipeline.

This environment exposes ONE physical TPU chip, so the >=10x BASELINE claim
cannot be measured directly.  This tool replaces the round-2 linear-scaling
assumption with an explicit communication model: the ONLY collective in the
whole pipeline is the phase-1 -> phase-2 all-to-all (frames-major ->
node-major reshard; the reference's global_transpose, psp_process.cpp:707-771),
plus two scalar-vector psums (avg/rms) whose volume is N floats per run —
noise.  Everything else is embarrassingly parallel over the frame axis.

Model (per chunk of F frames, N nodes, D chips):
  - compute:   t_comp = F/D * t_frame            (measured per-chip, 1 chip)
  - all2all:   each chip holds (F/D, N) f32 and must end with (F, N/D);
               it keeps the (F/D, N/D) diagonal block and sends the rest:
               bytes_out = 4 * F/D * N * (D-1)/D
  - t_comm = bytes_out / BW_egress   (no-overlap worst case; the streaming
               driver pipelines chunks, so real overlap pushes efficiency
               toward 1; we publish the WORST case)
  - efficiency(D) = t_comp / (t_comp + t_comm)

Bandwidth assumptions (stated, not measured here):
  - v5e ICI: 4 links/chip in a 2D torus, ~100 GB/s/chip aggregate one-way
    (public "How to Scale Your Model" v5e figures); conservative case uses a
    single link, 25 GB/s.
  - DCN (multi-host across slices): ~6.25 GB/s/host conservative.

Usage: python tools/bench_scaling_model.py --from-bench BENCH_FULLCONFIG.json
   or: ... --t-frame-ms <measured> --nodes 1e6  (no built-in defaults)
"""

import argparse
import json


def model(t_frame_ms: float, n_nodes: float, n_chips: int, bw_gbs: float,
          frames_per_chunk: int = 1024) -> dict:
    f_per_chip = frames_per_chunk / n_chips
    t_comp = f_per_chip * t_frame_ms * 1e-3  # s
    bytes_out = 4.0 * f_per_chip * n_nodes * (n_chips - 1) / n_chips
    t_comm = bytes_out / (bw_gbs * 1e9)
    eff = t_comp / (t_comp + t_comm)
    return dict(
        chips=n_chips,
        t_comp_s=t_comp,
        t_comm_s=t_comm,
        comm_bytes_per_frame=bytes_out / f_per_chip,
        efficiency=eff,
        agg_fps=n_chips * eff * 1e3 / t_frame_ms,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-bench", default=None,
                    help="BENCH_FULLCONFIG.json written by bench_fullconfig "
                         "--json-out: t_frame_ms and node count are taken "
                         "from the MEASURED record instead of defaults")
    ap.add_argument("--t-frame-ms", type=float, default=None,
                    help="measured per-frame phase-1 time on 1 chip "
                         "(full config 4cam x 2MP: tools/bench_fullconfig.py)")
    ap.add_argument("--nodes", type=float, default=None)
    ap.add_argument("--frames-per-chunk", type=int, default=1024)
    ap.add_argument("--json-out", default=None,
                    help="write the projection table (with its measured "
                         "inputs) to this JSON file")
    args = ap.parse_args()

    bench = None
    if args.from_bench:
        with open(args.from_bench) as fh:
            bench = json.load(fh)
        if args.t_frame_ms is None:
            args.t_frame_ms = bench.get(
                "t_frame_ms_end2end", bench["t_frame_ms_phase1"]
            )
        if args.nodes is None:
            args.nodes = float(bench["config"]["nodes"])
        print(f"measured inputs from {args.from_bench}: "
              f"t_frame={args.t_frame_ms:.3f} ms, N={args.nodes:.0f} "
              f"({bench['command']})")
    if args.t_frame_ms is None or args.nodes is None:
        ap.error("pass --from-bench BENCH_FULLCONFIG.json or explicit "
                 "--t-frame-ms/--nodes — this tool refuses built-in "
                 "defaults (a stale default is how the round-3 model "
                 "contradicted the measured 11.1 ms)")

    cases = [
        ("ICI 4-link (100 GB/s/chip)", 100.0),
        ("ICI 1-link conservative (25 GB/s/chip)", 25.0),
        ("DCN multi-host (6.25 GB/s/host)", 6.25),
    ]
    print(f"per-frame all-to-all egress at N={args.nodes:.0e}: "
          f"{4 * args.nodes * 15 / 16 / 1e6:.2f} MB/frame (D=16)")
    for label, bw in cases:
        print(f"\n{label}")
        for d in (2, 4, 8, 16):
            m = model(args.t_frame_ms, args.nodes, d, bw,
                      args.frames_per_chunk)
            print(f"  D={d:3d}: comm {m['t_comm_s']*1e3:7.2f} ms/chunk-slice "
                  f"vs comp {m['t_comp_s']*1e3:8.1f} ms  "
                  f"-> efficiency {m['efficiency']*100:6.2f}%  "
                  f"agg {m['agg_fps']:8.1f} fps")
    m16 = model(args.t_frame_ms, args.nodes, 16, 25.0, args.frames_per_chunk)
    headline = {
        "metric": "projected_v5e16_full_config_fps_worst_case",
        "value": round(m16["agg_fps"], 1),
        "efficiency_at_16_chips": round(m16["efficiency"], 4),
        "assumptions": "25 GB/s/chip egress, zero comm/compute overlap",
        "measured_inputs": {
            "t_frame_ms": args.t_frame_ms,
            "nodes": args.nodes,
            "source": args.from_bench or "command line",
        },
    }
    print("\n" + json.dumps(headline))
    if args.json_out:
        table = {
            label: [
                model(args.t_frame_ms, args.nodes, d, bw,
                      args.frames_per_chunk)
                for d in (2, 4, 8, 16)
            ]
            for label, bw in cases
        }
        with open(args.json_out, "w") as fh:
            json.dump({"headline": headline, "table": table,
                       "bench_record": bench}, fh, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
