"""Per-frame image registration: ECC affine alignment, pure JAX.

Replaces ``cv::findTransformECC`` + ``cv::warpAffine`` (cpp/lib/
registration.cpp:31-84 — behavior studied, not copied) with the
Evangelidis–Psarakis Enhanced-Correlation-Coefficient maximization written as a
``lax.while_loop`` of fused image ops + one small MXU matmul per iteration.

Conventions (identical to the reference):
- The warp ``W`` (2x3) maps *template/reference* pixel coords to *input* image
  coords: an aligned output is ``out(x) = input(W @ [x, y, 1])``.
- Iteration cap 50, epsilon 1e-3 on the correlation-coefficient increment
  (psp_process.cpp:1665-1667 defaults).
- Bilinear (or nearest) sampling, constant-zero borders.

Everything is ``vmap``-able over a frame batch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from upsp_tpu.ops.image import gaussian_blur
from upsp_tpu.ops.warp import warp_affine_mxu, warp_validity_mask


def identity_warp(dtype=jnp.float32) -> jax.Array:
    return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype)


def _sample_bilinear(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Bilinear sample with constant-0 out-of-bounds (cv2 BORDER_CONSTANT)."""
    H, W = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _sample_nearest(img: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    H, W = img.shape
    xi = jnp.rint(xs).astype(jnp.int32)
    yi = jnp.rint(ys).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return jnp.where(inb, v, 0.0)


@functools.partial(jax.jit, static_argnames=("interpolation",))
def warp_affine(img: jax.Array, warp: jax.Array, interpolation: str = "linear"):
    """out(y, x) = img(W @ [x, y, 1]) — cv2.warpAffine WARP_INVERSE_MAP parity."""
    H, W = img.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=img.dtype), jnp.arange(W, dtype=img.dtype), indexing="ij"
    )
    wx = warp[0, 0] * xs + warp[0, 1] * ys + warp[0, 2]
    wy = warp[1, 0] * xs + warp[1, 1] * ys + warp[1, 2]
    if interpolation == "nearest":
        return _sample_nearest(img, wx, wy)
    return _sample_bilinear(img, wx, wy)


def _gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Central differences with replicated edges ([-0.5, 0, 0.5] filter)."""
    gx = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img)
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


@functools.partial(jax.jit, static_argnames=("max_iters", "gauss_size", "levels"))
def ecc_affine_pyramid(
    ref: jax.Array,
    inp: jax.Array,
    max_iters: int = 50,
    epsilon: float = 1e-3,
    gauss_size: int = 5,
    levels: int = 2,
):
    """Coarse-to-fine ECC: estimate at 2^k decimation, refine at full res.

    Extends the capture range beyond single-level ECC (which needs the
    initial displacement within the blur radius) to ~2^levels x larger
    motions, at lower total cost — the coarse iterations run on 4^k fewer
    pixels.  Returns (warp, rho) like :func:`ecc_affine`.
    """
    from upsp_tpu.ops.warp import downsample2, scale_warp

    warp = identity_warp()
    for lev in range(levels - 1, -1, -1):
        r, i = ref.astype(jnp.float32), inp.astype(jnp.float32)
        for _ in range(lev):
            r = downsample2(r)
            i = downsample2(i)
        warp_lv = scale_warp(warp, 0.5**lev)
        warp_lv, rho, _ = _ecc_core(
            r, i, warp_lv, max_iters=max_iters, epsilon=epsilon,
            gauss_size=gauss_size,
        )
        warp = scale_warp(warp_lv, 2.0**lev)
    return warp, rho


@functools.partial(
    jax.jit, static_argnames=("max_iters", "gauss_size", "return_iters")
)
def ecc_affine(
    ref: jax.Array,
    inp: jax.Array,
    max_iters: int = 50,
    epsilon: float = 1e-3,
    gauss_size: int = 5,
    warp_init: jax.Array | None = None,
    return_iters: bool = False,
):
    """Estimate the 2x3 affine warp aligning ``inp`` to ``ref`` by ECC maximization.

    ``warp_init`` warm-starts the iteration (e.g. the previous frame's warp —
    model vibration is temporally coherent, so this typically converges in
    1-3 iterations instead of 5-15; the converged solution is unchanged since
    the objective and stopping rule are identical).  Returns (warp, rho), or
    (warp, rho, iters) with ``return_iters`` — the per-sequence telemetry that
    drives epsilon/iteration-budget tuning in production runs.
    """
    init = identity_warp() if warp_init is None else warp_init
    out = _ecc_core(ref, inp, init, max_iters=max_iters,
                    epsilon=epsilon, gauss_size=gauss_size)
    return out if return_iters else out[:2]


def _ecc_core(
    ref: jax.Array,
    inp: jax.Array,
    warp_init: jax.Array,
    max_iters: int = 50,
    epsilon: float = 1e-3,
    gauss_size: int = 5,
):
    dtype = jnp.float32
    tmpl = gaussian_blur(ref.astype(dtype), gauss_size)
    img = gaussian_blur(inp.astype(dtype), gauss_size)

    H, W = tmpl.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    tmpl_flat = tmpl.reshape(-1)

    def body(state):
        warp, rho_prev, drho, it = state
        # MXU separable warp instead of gathers (see ops/warp.py), and ONE
        # warp per iteration: warped gradients come from the warped image by
        # the affine chain rule  grad(img)(Wp) = A^-T grad_p[img(Wp)],
        # exact for affine warps up to the same finite-difference error as
        # differentiating the unwarped image.
        iw = warp_affine_mxu(img, warp, order=2)
        gix, giy = _gradients(iw)
        A = warp[:, :2]
        Ainv_T = jnp.linalg.inv(A).T
        gxw = Ainv_T[0, 0] * gix + Ainv_T[0, 1] * giy
        gyw = Ainv_T[1, 0] * gix + Ainv_T[1, 1] * giy

        # validity mask: pixels whose warped sample lies fully in-bounds.
        # All statistics/projections are restricted to it (findTransformECC
        # warps its mask the same way); without this the constant-0 border
        # drags the mean and diverges the solve.
        m = warp_validity_mask((H, W), warp)
        area = jnp.maximum(jnp.sum(m), 1.0)
        mf = m.reshape(-1)

        t_mean = jnp.sum(tmpl_flat * mf) / area
        tmpl_zm = (tmpl_flat - t_mean) * mf
        tmpl_norm = jnp.maximum(jnp.linalg.norm(tmpl_zm), 1e-12)

        iw_flat = iw.reshape(-1) * mf
        i_mean = jnp.sum(iw_flat) / area
        iw_zm = (iw_flat - i_mean) * mf

        # steepest-descent images for p = [a00 a10 a01 a11 tx ty]
        G = jnp.stack(
            [
                (gxw * xs).reshape(-1),
                (gyw * xs).reshape(-1),
                (gxw * ys).reshape(-1),
                (gyw * ys).reshape(-1),
                gxw.reshape(-1),
                gyw.reshape(-1),
            ],
            axis=1,
        ) * mf[:, None]  # (n_pix, 6)

        Hmat = G.T @ G  # (6,6) — MXU
        Hinv = jnp.linalg.inv(Hmat + 1e-12 * jnp.eye(6, dtype=dtype))
        i_proj = G.T @ iw_zm
        t_proj = G.T @ tmpl_zm
        iw_norm2 = jnp.dot(iw_zm, iw_zm)
        corr = jnp.dot(tmpl_zm, iw_zm)

        num = iw_norm2 - i_proj @ Hinv @ i_proj
        den = corr - t_proj @ Hinv @ i_proj
        lam = num / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
        err = lam * tmpl_zm - iw_zm
        dp = Hinv @ (G.T @ err)

        dwarp = jnp.array(
            [[dp[0], dp[2], dp[4]], [dp[1], dp[3], dp[5]]], dtype
        )
        new_warp = warp + dwarp
        rho = corr / jnp.maximum(tmpl_norm * jnp.sqrt(iw_norm2), 1e-12)
        return new_warp, rho, jnp.abs(rho - rho_prev), it + 1

    def cond(state):
        _, _, drho, it = state
        return (it < max_iters) & (drho >= epsilon)

    init = (
        warp_init.astype(dtype),
        jnp.asarray(-1.0, dtype),
        jnp.asarray(jnp.inf, dtype),
        0,
    )
    warp, rho, _, iters = jax.lax.while_loop(cond, body, init)
    return warp, rho, iters


@functools.partial(jax.jit, static_argnames=("max_iters", "interpolation"))
def register_frame(
    ref: jax.Array,
    inp: jax.Array,
    max_iters: int = 50,
    epsilon: float = 1e-3,
    interpolation: str = "linear",
):
    """ECC-align ``inp`` to ``ref`` and return (aligned image, warp, rho).

    Mirrors upsp::register_pixel (registration.cpp:31-84): the warp estimated on
    blurred/float images is applied to the *raw* input.
    """
    warp, rho = ecc_affine(ref, inp, max_iters=max_iters, epsilon=epsilon)
    if interpolation == "nearest":
        aligned = warp_affine(inp.astype(jnp.float32), warp, interpolation="nearest")
    else:
        aligned = warp_affine_mxu(inp.astype(jnp.float32), warp)
    return aligned, warp, rho
