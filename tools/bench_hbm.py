"""HBM bandwidth probes: what does one real pass cost on this chip?

BENCH_NOTES derives a ~0.09-0.10 ms "per-pass" cost at 1 MP from component
deltas, which implies ~90-110 GB/s effective — ~11-13% of v5e's ~819 GB/s.
This tool measures the floor directly so the gap can be attributed.

Methodology: each probe is a `lax.fori_loop` whose carry is the full array —
the loop body compiles ONCE and its carry must round-trip HBM every
iteration, so XLA cannot fuse the chain into a single register-resident
kernel (a plain Python-unrolled chain with `optimization_barrier` measured
~0 us/pass here: the whole chain fused into one elementwise kernel).  The
per-pass cost is (t_K2 - t_K1) / (K2 - K1) — differencing two loop lengths
cancels dispatch/RTT exactly (the ~25 ms tunnel round trip otherwise buries
passes measured in tens of microseconds).  Synchronization is a forced
device->host fetch (``block_until_ready`` under-waits on this backend —
tools/benchlib.py).

Usage: python tools/bench_hbm.py [--reps 5]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    """Fetch-synced timing (block_until_ready under-waits here — benchlib)."""
    from benchlib import force_fetch

    force_fetch(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force_fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def loop_cost(make_loop, k1, k2, *args, reps=5):
    t1 = timed(make_loop(k1), *args, reps=reps)
    t2 = timed(make_loop(k2), *args, reps=reps)
    return (t2 - t1) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(0)

    def report(name, per_pass, bytes_per_pass):
        gbs = bytes_per_pass / per_pass / 1e9
        print(f"{name:42s} {per_pass*1e6:9.1f} us/pass  {gbs:7.1f} GB/s",
              flush=True)

    for shape, label, k1, k2 in [
        ((1024 * 1024,), "flat 4 MB", 64, 1024),
        ((8, 1024, 1024), "batched 8 x 1 MP (34 MB)", 32, 512),
        ((64, 1024, 1024), "batched 64 x 1 MP (268 MB)", 16, 128),
    ]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        nbytes = x.size * 4

        def make_copy(K):
            @jax.jit
            def f(x):
                return jax.lax.fori_loop(
                    0, K, lambda i, v: v * 1.000001, x
                )
            return f

        report(
            f"copy r+w ({label})",
            loop_cost(make_copy, k1, k2, x, reps=args.reps),
            2 * nbytes,
        )

        y = jnp.asarray(rng.normal(size=shape).astype(np.float32))

        def make_axpy(K):
            @jax.jit
            def f(x, y):
                return jax.lax.fori_loop(
                    0, K, lambda i, v: 1.000001 * v + y, x
                )
            return f

        report(
            f"axpy 2r+1w ({label})",
            loop_cost(make_axpy, k1, k2, x, y, reps=args.reps),
            3 * nbytes,
        )

    # the same probes for structured phase-1 ops at the working shape
    from upsp_tpu.ops.image import gaussian_blur
    from upsp_tpu.ops.warp import warp_affine_mxu

    x = jnp.asarray(
        rng.normal(2000, 200, (8, 1024, 1024)).astype(np.float32)
    )
    nbytes = x.size * 4
    warp = jnp.broadcast_to(
        jnp.array([[1.0, 1e-4, 0.3], [-1e-4, 1.0, -0.2]], jnp.float32),
        (8, 2, 3),
    )

    def make_blur(K):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(
                0, K,
                lambda i, v: jax.vmap(lambda im: gaussian_blur(im, 3))(v),
                x,
            )
        return f

    # a separable gaussian3 is 2 conceptual passes (h then v sweep) if the
    # intermediate materializes, 1 if XLA fuses them; report against 2 passes
    report(
        "gaussian3 separable (8 x 1 MP, 2-pass model)",
        loop_cost(make_blur, 16, 128, x, reps=args.reps) / 2,
        2 * nbytes,
    )

    def make_warp(K):
        @jax.jit
        def f(x, w):
            return jax.lax.fori_loop(
                0, K,
                lambda i, v: jax.vmap(warp_affine_mxu)(v, w),
                x,
            )
        return f

    report(
        "warp_affine_mxu order2 (8 x 1 MP)",
        loop_cost(make_warp, 8, 64, x, warp, reps=args.reps),
        2 * nbytes,
    )


if __name__ == "__main__":
    main()
