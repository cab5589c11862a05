"""Sustained out-of-core endurance run at a size where out-of-core matters.

Drives the PRODUCTION ``run_datapoint_streaming`` driver end to end — phase 0
(BVH/projection build from real input files), the chunked phase-1 stream with
the native AsyncWriter, the native on-disk frames->nodes blocked transpose,
and the disk-blocked phase 2 — on a multi-thousand-frame 1 MP synthetic
datapoint whose (F, N) intensity matrix EXCEEDS device HBM (the reference's
operating regime: 1M nodes x 50k frames == 186 GB per flat file,
docs/md/upsp-user-manual.md:776-780; five-buffer disk scheme
psp_process.cpp:524-563).

Frames are synthesized ON DEVICE (a bank of statically-rolled variants of a
textured base frame, modulated per frame) through the driver's callable
frame-source hook, because this environment reaches its TPU through a
~20-25 MB/s tunnel: host-side synthesis would measure the tunnel, not the
pipeline.  Output fetches (intensity chunks) and phase-2 block pushes still
cross the tunnel — unavoidable, the flat files live on the host — so the
tool ALSO measures each leg's raw bandwidth (tunnel fetch/push, disk
write/read) and reports a production-host projection in which the tunnel is
replaced by a PCIe-class link and the binding constraint is disk vs device.

Usage: python tools/bench_endurance.py [--frames 4608] [--grid 1024,1024]
         [--hw 1024,1024] [--chunk 64] [--node-block 65536]
         [--out-dir /root/endurance] [--json-out BENCH_ENDURANCE.json]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def probe_disk(path: str, nbytes: int = 2 << 30) -> dict:
    """Raw sequential write/read bandwidth of the filesystem holding path."""
    import ctypes

    blk = np.random.default_rng(0).integers(
        0, 255, size=nbytes, dtype=np.uint8
    ).tobytes()
    fp = os.path.join(path, "_diskprobe.bin")
    t0 = time.perf_counter()
    with open(fp, "wb") as fh:
        fh.write(blk)
        fh.flush()
        os.fsync(fh.fileno())
    t_w = time.perf_counter() - t0
    # drop the page cache for this file so the read probe hits the disk
    fd = os.open(fp, os.O_RDONLY)
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.posix_fadvise(fd, 0, 0, 4)  # POSIX_FADV_DONTNEED
    finally:
        os.close(fd)
    t0 = time.perf_counter()
    with open(fp, "rb") as fh:
        while fh.read(64 << 20):
            pass
    t_r = time.perf_counter() - t0
    os.remove(fp)
    return {
        "write_MBps": round(nbytes / t_w / 1e6, 1),
        "read_MBps": round(nbytes / t_r / 1e6, 1),
        "probe_bytes": nbytes,
    }


def probe_tunnel(jnp, nbytes: int = 256 << 20) -> dict:
    """Host<->device link bandwidth (the tunnel in this environment).

    block_until_ready under-waits on async host->device transfers on this
    backend (BENCH_NOTES.md), so the push leg is fenced by fetching one
    element back — otherwise the pending upload bleeds into the fetch leg
    and the split is meaningless (a round-4 artifact reported 912/0.7 MB/s
    for a ~25 MB/s link because of exactly this)."""
    host = np.random.default_rng(1).random(nbytes // 4, np.float32)
    t0 = time.perf_counter()
    dev = jnp.asarray(host)
    _ = np.asarray(dev[-1:])  # fence: forces the upload to complete
    t_push = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(dev)
    t_fetch = time.perf_counter() - t0
    return {
        "push_MBps": round(nbytes / t_push / 1e6, 1),
        "fetch_MBps": round(nbytes / t_fetch / 1e6, 1),
        "probe_bytes": nbytes,
    }


def write_inputs(out_dir: str, hw, grid_shape) -> tuple:
    """Grid/camera/wtd/paint input files for a production phase 0."""
    from upsp_tpu.io.plot3d import write_p3d_grid
    from upsp_tpu.pipeline.synthetic import make_plate_grid

    H, W = hw
    gi, gj = grid_shape
    grid_path = os.path.join(out_dir, "plate.grid")
    write_p3d_grid(grid_path, make_plate_grid(gi, gj))
    # overhead camera framing the 10x8 plate with ~86% margin (the
    # synthetic-state geometry, pipeline/synthetic.py)
    fx = min(W, H) * 20.0 / 12.0 * 0.86
    cam_path = os.path.join(out_dir, "cam.json")
    with open(cam_path, "w") as fh:
        json.dump(
            {
                "uPSP_cameraMatrix": [[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]],
                "distCoeffs": [[0, 0, 0, 0, 0]],
                "rmat": [[1, 0, 0], [0, -1, 0], [0, 0, -1]],
                "tvec": [-5.0, 4.0, 20.0],
            },
            fh,
        )
    wtd_path = os.path.join(out_dir, "t.wtd")
    with open(wtd_path, "w") as fh:
        fh.write("RUN 1 1\n#\tMACH\tALPHA\tBETA\tPHI\tQ\tPS\tTTF\tSTRUTZ\n")
        fh.write("0.80\t0.00\t0.00\t0.00\t144.00\t500.00\t80.00\t0.00\n")
    paint_path = os.path.join(out_dir, "paint.cal")
    with open(paint_path, "w") as fh:
        fh.write("a = 1.0\nb = 0.0\nc = 0\nd = 0\ne = 0\nf = 0\n")
    return grid_path, cam_path, wtd_path, paint_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4608)
    ap.add_argument("--hw", default="1024,1024")
    ap.add_argument("--grid", default="1024,1024")
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--node-block", type=int, default=131072)
    ap.add_argument("--out-dir", default="/root/endurance")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--keep-files", action="store_true")
    ap.add_argument("--write-hdf5", action="store_true",
                    help="also stream the HDF5 (adds another (N,F)-sized file)")
    args = ap.parse_args()

    H, W = map(int, args.hw.split(","))
    gi, gj = map(int, args.grid.split(","))
    F = args.frames
    n_nodes_approx = gi * gj
    fn_bytes = F * n_nodes_approx * 4
    print(
        f"endurance config: {F} frames x {H}x{W} ({H*W/1e6:.2f} MP), "
        f"{n_nodes_approx/1e6:.2f}M nodes -> (F,N) = {fn_bytes/2**30:.1f} GiB "
        f"per flat file (HBM is 16 GiB)",
        flush=True,
    )
    need = fn_bytes * (3 + (1 if args.write_hdf5 else 0)) + (4 << 30)
    free = shutil.disk_usage(os.path.dirname(args.out_dir) or "/").free
    if free < need:
        sys.exit(f"need ~{need/2**30:.0f} GiB free, have {free/2**30:.0f}")

    os.makedirs(args.out_dir, exist_ok=True)
    disk = probe_disk(args.out_dir)
    print(f"disk: {disk}", flush=True)

    import jax
    import jax.numpy as jnp

    tunnel = probe_tunnel(jnp)
    print(f"host<->device link: {tunnel}", flush=True)

    from upsp_tpu.pipeline.config import CameraInputs, ProcessingConfig
    from upsp_tpu.pipeline.run import run_datapoint_streaming
    from upsp_tpu.pipeline.synthetic import make_reference_frame
    from upsp_tpu.utils.timing import StageClock

    grid_path, cam_path, wtd_path, paint_path = write_inputs(
        args.out_dir, (H, W), (gi, gj)
    )
    cfg = ProcessingConfig(
        test_id="endurance", run=1, sequence=1,
        cameras=[CameraInputs(number=1, calibration=cam_path)],
        grid=grid_path, sds=wtd_path, paint_cal=paint_path,
        registration="pixel", target_patcher="none",
        out_dir=os.path.join(args.out_dir, "out"),
        frames=F,
    )
    os.makedirs(cfg.out_dir, exist_ok=True)

    # device-resident frame bank: V statically-rolled variants of a textured
    # base (static rolls compile instantly), gathered + modulated per chunk
    V = 16
    base = make_reference_frame((H, W), seed=0).astype(np.float32)
    rng = np.random.default_rng(7)
    shifts = rng.integers(-2, 3, size=(V, 2))
    shifts[0] = 0  # frame 0 is the ECC template
    bank = jnp.asarray(
        np.stack([np.roll(base, tuple(s), axis=(0, 1)) for s in shifts])
    )  # (V, H, W) — 64 MB once over the tunnel

    @jax.jit
    def synth(idx):
        mod = 1.0 + 0.01 * jnp.sin(2.0 * jnp.pi * idx.astype(jnp.float32) / 7.0)
        return bank[idx % V][:, None] * mod[:, None, None, None]

    def source(start, count):
        return synth(jnp.arange(start, start + count))

    clock = StageClock()
    t0 = time.perf_counter()
    out = run_datapoint_streaming(
        cfg,
        frames_per_chunk=args.chunk,
        node_block=args.node_block,
        frames_array=source,
        write_hdf5=args.write_hdf5,
        stage_clock=clock,
    )
    wall = time.perf_counter() - t0
    n_nodes = int(out.intensity_avg.shape[0])
    stages = {label: round(since, 2) for label, _, since, _ in clock.records}
    t_proc = sum(
        stages.get(k, 0.0)
        for k in ("phase1_stream", "disk_transpose", "phase2_blocks")
    )
    rec = {
        "metric": "sustained_fps_out_of_core_1MP",
        "value": round(F / t_proc, 2),
        "unit": "frames/s",
        "config": {
            "frames": F, "hw": [H, W], "nodes": n_nodes,
            "chunk": args.chunk, "node_block": args.node_block,
            "flat_file_GiB": round(fn_bytes / 2**30, 2),
            "exceeds_hbm": fn_bytes > (16 << 30),
        },
        "stages_s": stages,
        "wall_s": round(wall, 1),
        "phase1_fps": round(F / stages["phase1_stream"], 2),
        "disk": disk,
        "tunnel": tunnel,
        "command": " ".join(sys.argv),
    }
    # production-host projection: replace the tunnel with a PCIe-class link
    # (>=10 GB/s) and the sustained rate is bound by min(device, disk):
    # phase-1 device time comes from the headline bench; each frame moves
    # 4N bytes device->disk (write), then 4N disk->device->disk in phase 2
    bytes_per_frame = 4 * n_nodes
    disk_fps = min(disk["write_MBps"], disk["read_MBps"]) * 1e6 / bytes_per_frame
    rec["projection_production_host"] = {
        "disk_bound_fps": round(disk_fps, 1),
        "note": "sustained fps on a local-attached host = min(device fps, "
                "disk_bound_fps); here the tunnel (~MB/s) is the binding "
                "constraint and is an environment artifact (BENCH_NOTES.md)",
    }
    print(json.dumps(rec), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"wrote {args.json_out}", flush=True)
    if not args.keep_files:
        shutil.rmtree(cfg.out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
