"""Tiny-size on-chip smoke test for new Pallas kernel structures.

CLAUDE.md rule: never first-compile a new kernel structure at full size —
pathological Mosaic compiles cannot be cancelled and wedge the shared
compile service.  This compiles each kernel at a small-but-tiled size
(256x256, batch 2), checks numerics vs the interpret path, and prints
wall-clock compile times.

Usage: python tools/smoke_pallas.py [--size 256,256]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256,256")
    args = ap.parse_args()
    H, W = map(int, args.size.split(","))

    from upsp_tpu.ops import pallas_ecc as pe

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(2000, 300, (H, W)).astype(np.float32))
    tmpl = jnp.asarray(rng.normal(2000, 300, (H, W)).astype(np.float32))
    warp = jnp.asarray(
        np.array([[1.0003, -1e-4, 0.4], [2e-4, 0.9997, -0.7]], np.float32)
    )
    imgs = jnp.stack([img, img + 1.0])
    warps = jnp.stack([warp, warp])

    checks = []

    t0 = time.time()
    out = jax.vmap(pe.warp_affine_banded)(imgs, warps)
    out.block_until_ready()
    print(f"warp_affine_banded compile+run: {time.time()-t0:.1f}s", flush=True)
    ref = pe._warp_banded_batched(imgs, warps, pe.DEFAULT_BAND, 2, True)
    checks.append(("warp", float(jnp.abs(out - ref).max())))

    t0 = time.time()
    mom = jax.vmap(lambda i, w: pe.ecc_gn_moments(i, tmpl, w, w))(imgs, warps)
    mom.block_until_ready()
    print(f"ecc_gn_moments compile+run: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    fused = jax.vmap(lambda i, w: pe.ecc_gn_fused(i, tmpl, w, w))(imgs, warps)
    fused.block_until_ready()
    print(f"ecc_gn_fused compile+run: {time.time()-t0:.1f}s", flush=True)
    # on-chip fused vs on-chip split composition
    split = jax.vmap(
        lambda i, w: pe.ecc_gn_moments(pe.warp_affine_banded(i, w), tmpl, w, w)
    )(imgs, warps)
    rel = float(
        jnp.abs(fused[:, :42] - split[:, :42]).max()
        / jnp.abs(split[:, :42]).max()
    )
    checks.append(("fused_vs_split_rel", rel))

    t0 = time.time()
    from upsp_tpu.ops.pallas_ecc import filter_taps, make_warp_filter

    wf = make_warp_filter(filter_taps("gaussian", 3))
    out_f = jax.vmap(wf)(imgs, warps)
    out_f.block_until_ready()
    print(f"warp_filter compile+run: {time.time()-t0:.1f}s", flush=True)
    from upsp_tpu.ops.image import gaussian_blur

    ref_f = jax.vmap(lambda i, w: gaussian_blur(
        pe._warp_banded_batched(i[None], w[None], pe.DEFAULT_BAND, 2, True)[0],
        3))(imgs, warps)
    checks.append(("warp_filter", float(jnp.abs(out_f - ref_f).max())))

    t0 = time.time()
    from upsp_tpu.ops.pallas_ecc import fix_hot_pixels_pallas, make_blur
    from upsp_tpu.ops.image import (
        fix_hot_pixels,
        gaussian_blur,
        gaussian_kernel_1d,
    )

    hot16 = (np.clip(np.asarray(img), 0, 4000)).astype(np.uint16)
    hot16[5, 7] = 4095
    hot16 = jnp.asarray(np.stack([hot16, hot16]))
    out_h = jax.vmap(fix_hot_pixels_pallas)(hot16)
    out_h.block_until_ready()
    print(f"hot_pixel compile+run: {time.time()-t0:.1f}s", flush=True)
    ref_h = jax.vmap(fix_hot_pixels)(hot16)
    checks.append(("hot_pixel", float(jnp.abs(
        out_h.astype(jnp.int32) - ref_h.astype(jnp.int32)).max())))

    t0 = time.time()
    blur = make_blur(tuple(float(t) for t in gaussian_kernel_1d(5)))
    out_b = jax.vmap(blur)(imgs)
    out_b.block_until_ready()
    print(f"blur compile+run: {time.time()-t0:.1f}s", flush=True)
    ref_b = jax.vmap(lambda i: gaussian_blur(i, 5))(imgs)
    checks.append(("blur", float(jnp.abs(out_b - ref_b).max())))

    for name, v in checks:
        print(f"{name}: {v:.3e}")
    ok = checks[0][1] < 1e-3 and checks[1][1] < 1e-5
    print("SMOKE", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
