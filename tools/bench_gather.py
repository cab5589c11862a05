"""Microbenchmark: 1M-node projection-gather formulations on the TPU.

The full-config profile (round 5) attributes ~3 ms/frame — 33% of the
whole per-frame program — to the single combined projection gather
(1M static node indices into the stacked (C*H*W,) processed-image
buffer).  The reference's equivalent is the per-frame SpMV
(cpp/lib/projection.ipp:884-905).  Indices are PHASE-0 CONSTANTS, so any
preprocessing (sorting, permutation composition, blocking) is free; this
tool measures the candidate formulations so the production pick is a
measurement, not a guess:

  plain          jnp take, phase-0 node order (the shipped baseline)
  sorted         gather with presorted indices + indices_are_sorted flag,
                 then un-permute via a second (N from N) gather
  sorted_only    the sorted-gather half alone (bounds the un-permute cost)
  unperm_only    the (N from N) permutation gather alone
  rowcol         two-stage: gather rows (N,W) slab rows via take along axis
                 0 of the (rows, W) image view, then per-node column pick
                 via take_along_axis (trades one big gather for one
                 medium + one small)
  onehot_mxu     per-row one-hot matmul column-select (MXU does the
                 gather; only viable if nodes-per-row is dense)

Timing: chained K applications inside one jit with a final fetch
(tools/benchlib.py methodology — per-op timing through the tunnel is
meaningless).

Usage: python tools/bench_gather.py [--nodes 1048576] [--cams 4]
       [--hw 1200,1800] [--reps 30]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])  # fence
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn_j(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])  # fence
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1048576)
    ap.add_argument("--cams", type=int, default=4)
    ap.add_argument("--hw", default="1200,1800")
    ap.add_argument("--chain", type=int, default=16,
                    help="gathers chained per jit call")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    H, W = map(int, args.hw.split(","))
    C, N, K = args.cams, args.nodes, args.chain
    P = C * H * W
    rng = np.random.default_rng(0)

    # realistic index structure: nodes laid out grid-major, projecting to a
    # smooth per-camera map -> indices are piecewise near-monotone with
    # jitter, split across cameras
    side = int(np.sqrt(N))
    gi, gj = np.divmod(np.arange(N), side)
    cam = (gi * C // (N // side + 1)).clip(0, C - 1)
    u = (gj * (W - 8) // side + rng.integers(0, 3, N)).clip(0, W - 1)
    v = (gi * (H - 8) % ((N // side + 1) or 1)).clip(0, H - 1)
    v = ((gi * (H - 8)) // ((N // side) + 1)).clip(0, H - 1)
    idx = (cam * H * W + v * W + u).astype(np.int32)

    img = rng.normal(2000, 300, P).astype(np.float32)
    img_d = jnp.asarray(img)
    idx_d = jnp.asarray(idx)
    weight = jnp.asarray(rng.random(N).astype(np.float32))

    order = np.argsort(idx, kind="stable")
    idx_sorted = jnp.asarray(idx[order])
    unperm = jnp.asarray(np.argsort(order, kind="stable").astype(np.int32))

    def chain(g):
        def fn(im):
            acc = jnp.zeros((N,), jnp.float32)
            x = im
            for k in range(K):
                acc = acc + g(x)
                x = x + 1.0  # defeat CSE
            return acc
        return fn

    def g_plain(im):
        return im[idx_d] * weight

    def g_sorted(im):
        s = im.at[idx_sorted].get(indices_are_sorted=True)
        return s.at[unperm].get(unique_indices=True) * weight

    def g_sorted_only(im):
        return im.at[idx_sorted].get(indices_are_sorted=True)

    def g_unperm_only(im):
        return im[:N].at[unperm].get(unique_indices=True)

    rows_d = jnp.asarray((idx // W).astype(np.int32))
    cols_d = jnp.asarray((idx % W).astype(np.int32))

    def g_rowcol(im):
        im2 = im.reshape(C * H, W)
        slab = im2[rows_d]           # (N, W) row gather
        return jnp.take_along_axis(slab, cols_d[:, None], axis=1)[:, 0]

    results = {}
    for name, g in [
        ("plain", g_plain),
        ("sorted", g_sorted),
        ("sorted_only", g_sorted_only),
        ("unperm_only", g_unperm_only),
        # rowcol materializes (N, W) = 7.2 GB at 1M x 1800 — only run at
        # small W; skipped by default (kept for small-image configs)
    ]:
        t = timed(chain(g), img_d, reps=args.reps)
        per = t / K * 1e6
        results[name] = per
        print(f"{name:14s} {per:9.1f} us/gather   ({per/N*1e3:.3f} ns/el)",
              flush=True)
    print(results)


if __name__ == "__main__":
    main()
