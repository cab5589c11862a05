"""Per-component device timing of the phase-1 frame program at 1 MP.

Chained-K methodology: each op is applied K times inside one jit (output
feeds the next application where possible) so the ~25 ms tunnel RTT and
dispatch floor amortize away; reported cost = (t_K - t_0) / K where t_0 is
the empty chain.  Synchronization is a forced device->host fetch of one
output element — ``block_until_ready`` under-waits on this backend (see
tools/benchlib.py and BENCH_NOTES.md).

Usage: python tools/bench_components.py [--hw 1024,1024] [--batch 8]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    def sync():
        out = fn(*args)
        return float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    sync()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1024,1024")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=20480)
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))
    B, K = args.batch, args.chain

    from upsp_tpu.ops.image import apply_filter, fix_hot_pixels, gaussian_blur
    from upsp_tpu.ops.warp import warp_affine_mxu, warp_validity_mask
    from upsp_tpu.ops.fftreg import correlate, default_decimate, prepare_template

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(2000, 200, (B, H, W)).astype(np.float32))
    warp = jnp.broadcast_to(
        jnp.array([[1.0, 1e-4, 0.3], [-1e-4, 1.0, -0.2]], jnp.float32), (B, 2, 3)
    )
    idx = jnp.asarray(rng.integers(0, H * W, args.nodes).astype(np.int32))
    wt = jnp.asarray(rng.random(args.nodes).astype(np.float32))

    def chain(op):
        @jax.jit
        def f(x, *rest):
            for _ in range(K):
                x = op(x, *rest)
            return x
        return f

    base = timed(chain(lambda x: x), img)

    def report(name, t):
        print(f"{name:44s} {(t-base)/K/B*1e3:7.3f} ms/frame", flush=True)

    print(f"{B} x {H}x{W} f32, chain={K}; empty chain {base*1e3:.1f} ms",
          flush=True)

    report("fix_hot_pixels", timed(chain(jax.vmap(fix_hot_pixels)), img))
    report("warp_affine_mxu", timed(
        chain(lambda x: jax.vmap(warp_affine_mxu)(x, warp)), img))
    report("apply_filter gaussian 3", timed(
        chain(jax.vmap(lambda x: apply_filter(x, "gaussian", 3))), img))
    report("gaussian_blur 5 (ECC pre-blur)", timed(
        chain(jax.vmap(lambda x: gaussian_blur(x, 5))), img))
    # NOTE on probe hygiene: each chained iteration must (a) depend on data
    # that changes across iterations (or XLA CSE collapses K applications to
    # one) and (b) keep the measured op's output in the dataflow through a
    # NONZERO multiplier (a literal *0.0 is foldable at XLA's discretion).
    # The 1e-30 feedback term changes x each iteration by an amount far below
    # measurement noise while defeating both CSE and DCE.
    report("warp_validity_mask", timed(
        chain(lambda x: x + jax.vmap(
            lambda w, v: warp_validity_mask((H, W), w + v * 1e-30),
        )(warp, x[:, :2, :3])), img))
    report("projection gather (20k nodes)", timed(
        chain(lambda x: x + (x.reshape(B, -1)[:, idx] * wt).sum() * 1e-30), img))

    dec = default_decimate(H, W)
    tm = prepare_template(img[0], dec)

    def fft_op(x):
        tv = jax.vmap(lambda f: correlate(tm, f))(x)
        return x + tv.sum() * 1e-30

    report("fft phase-correlation init", timed(chain(fft_op), img))

    # ECC single GN step cost for scale (matches bench_ablate marginal)
    from upsp_tpu.ops.registration import ecc_affine

    def ecc_op(x):
        w, r, _ = jax.vmap(
            lambda rf, ip: ecc_affine(rf, ip, max_iters=1, unroll=True,
                                      return_iters=True)
        )(img, x)
        return x + r[:, None, None] * 1e-30

    report("ecc 1 GN step (incl blur+stats)", timed(chain(ecc_op), img))


if __name__ == "__main__":
    main()
