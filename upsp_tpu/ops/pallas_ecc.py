"""Pallas TPU kernels for the ECC hot loop: banded warp + fused GN statistics.

Device-profile motivation (round 4, tools/profile_phase1.py at 1 MP,
frame_batch=8, f32): of the 446 us/frame production program, ~68% was the
GN-step machinery lowered through XLA —

  - 101 us/frame of ``reduce_sum`` + 58 us of feeding ``mul``: the ~30
    moment reductions of each Gauss-Newton step re-read the gradient images
    pass after pass;
  - 52 us of tent-matrix construction ``mul`` + 46 us of ``dot_general``:
    the dense separable-warp matmuls (ops/warp.py) spend 4.3 GFLOP and
    ~24 MB of HBM tent traffic per frame on what is fundamentally a 2-tap
    resample;
  - 46 us for the final output warp (same dense path).

Both kernels keep the whole image VMEM-resident per (batch) grid step and
touch HBM once.  Neither uses dynamic slicing or dynamic rolls (both
compile pathologically on this backend — dynamic row slices must prove
8-alignment, dynamic rolls hang the Mosaic pipeline); every dynamic
quantity lives in tap WEIGHTS computed from SMEM scalars.

``warp_affine_banded``
    The separable affine warp + 2nd-order shear Taylor correction of
    ``ops.warp.warp_affine_mxu`` as a static-tap banded resample: every
    output row/column is a tent-weighted sum of ``2*band+1`` statically
    shifted slices.  Exact (f32 tent weights, no matmul rounding — the same
    semantics as ``warp_affine_mxu(band=...)``, the round-2 precision
    oracle) while every sample displacement stays within ``band - 1`` px;
    production fft-mode ECC warps are sub-pixel + a bounded residual (the
    phase-correlation estimate's integer part is pre-shifted away in
    ``phase1.make_chunk_processor``), so the contract holds by
    construction.  Out-of-band displacements sample as zero — the same
    convention as walking off the image.

``ecc_gn_moments``
    The complete per-iteration ECC statistics — warped-gradient transform,
    validity mask, the 18 Hessian moments, the 3x6 raw steepest-descent
    projections, and the 6 masked scalar sums — in ONE pass over (iw, tmpl).
    Row/column-separable accumulation: each field is reduced along lanes
    against {1, x, x^2} first, then the per-row partials are contracted
    with {1, y, y^2}.  Zero-mean quantities are reconstructed outside the
    kernel from raw moments (``proj((u - mean(u)) m) = proj(u m) -
    mean(u) proj(m)`` for a binary mask; exact in real arithmetic, differs
    from the jnp path only by f32 rounding/reduction order).

Reference behavior being accelerated: cv::findTransformECC's per-iteration
warp + steepest-descent accumulation (cpp/lib/registration.cpp:63-80 —
studied, not copied).

Both kernels are exposed through ``jax.custom_batching.custom_vmap`` so the
existing per-image ECC code vmaps over frame batches straight into the
batched grid dimension.  On non-TPU backends they run in interpreter mode
(tests); production CPU paths keep the jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# displacement band: taps d in [-BAND, BAND].  The bilinear tent needs taps
# floor(d), floor(d)+1, so the resample is EXACT while every sample
# displacement stays within BAND px (beyond that, samples read as zero —
# the same convention as walking off the image, and it shows up as a rho
# drop in the registration telemetry).  After integer pre-shifting the fft
# translation estimate, production displacements are a sub-pixel init
# (<=0.7 px) + affine edge terms + GN updates (~<=0.5 px) — worst case
# ~1.2 px, so 3 keeps ~1.8 px of headroom.  Tap count is the warp kernels'
# dominant VPU cost: band 3 measured 3672 vs band 4's 3430 fps at the 1 MP
# headline (+7%).  UPSP_PALLAS_BAND overrides for A/B measurement.
import os as _os


def _resolve_band() -> int:
    """Validate UPSP_PALLAS_BAND (positive int; warn when non-default so two
    environments producing different numerics for the same code is at least
    visible in the logs)."""
    raw = _os.environ.get("UPSP_PALLAS_BAND", "3")
    try:
        band = int(raw)
    except ValueError:
        raise ValueError(
            f"UPSP_PALLAS_BAND must be a positive integer, got {raw!r}"
        ) from None
    if band < 1:
        raise ValueError(
            f"UPSP_PALLAS_BAND must be a positive integer, got {band}"
        )
    if band != 3:
        import logging

        logging.getLogger("upsp_tpu").warning(
            "UPSP_PALLAS_BAND=%d overrides the default band 3; banded-warp "
            "numerics differ from the default build (exactness bound %d px)",
            band, band,
        )
    return band


DEFAULT_BAND = _resolve_band()
_ROW_CHUNK = 256


def _row_chunks(h: int, chunk: int):
    return [(r0, min(chunk, h - r0)) for r0 in range(0, h, chunk)]


def _tent(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _iota_col(n, off=0.0):
    """(n, 1) float32 column iota (1-D and float iotas are unsupported on
    TPU — generate int32 and convert)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)
        + off
    )


def _iota_row(n, off=0.0):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.float32)
        + off
    )


def _shift_cols(x, d, w):
    """out[:, i] = x[:, i + d], zero where i + d leaves [0, w).

    Static circular roll + lane-validity mask: lane-dimension concats of
    sliced operands hit a Mosaic "offset mismatch on non-concat dimension"
    lowering gap, while static rolls lower cleanly.
    """
    if d == 0:
        return x
    from jax.experimental.pallas import tpu as _pltpu

    r = _pltpu.roll(x, (-d) % w, 1)  # roll requires a non-negative shift
    xs = _iota_row(w)
    valid = ((xs + d) >= 0) & ((xs + d) < w)
    return r * valid.astype(jnp.float32)


def _sep_rows_block(img_ref, scal, r0, n, band, h, w):
    """Separable-warp rows [r0, r0+n) of the image (no Taylor terms).

    Row resample: out row (global) g samples source row y_sep(g); with the
    banded contract |y_sep(g) - g| < band, source row g + d for
    d in [-band, band] — a static slice of the resident image per tap, with
    the tent weight carrying all dynamics.  Rows whose source leaves [0, h)
    get zero weight (BORDER_CONSTANT).  Columns analogously via a
    lane-padded scratch.
    """
    a00, a01, tx = scal[0], scal[1], scal[2]
    a10, a11, ty = scal[3], scal[4], scal[5]
    cy = (h - 1) * 0.5
    cx = (w - 1) * 0.5
    gi = _iota_col(n, float(r0))  # (n, 1) global row index
    y_off = (a11 - 1.0) * gi + ty + a10 * cx  # y_sep - g

    acc = jnp.zeros((n, w), jnp.float32)
    for d in range(-band, band + 1):
        s0 = r0 + d
        lo = max(0, -s0)  # first local row whose source row is >= 0
        hi = min(n, h - s0)  # rows beyond this have source >= h
        if hi <= lo:
            continue
        src = img_ref[0, s0 + lo : s0 + hi, :].astype(jnp.float32)
        wrow = _tent(y_off[lo:hi] - d)  # (hi-lo, 1)
        if lo == 0 and hi == n:
            acc = acc + wrow * src
        else:
            pieces = []
            if lo > 0:
                pieces.append(jnp.zeros((lo, w), jnp.float32))
            pieces.append(wrow * src)
            if n - hi > 0:
                pieces.append(jnp.zeros((n - hi, w), jnp.float32))
            acc = acc + jnp.concatenate(pieces, axis=0)

    xs = _iota_row(w)  # (1, w)
    x_off = (a00 - 1.0) * xs + tx + a01 * cy  # x_sep - x
    out = jnp.zeros((n, w), jnp.float32)
    for d in range(-band, band + 1):
        wcol = _tent(x_off - d)
        out = out + wcol * _shift_cols(acc, d, w)
    return out


def _taylor_correct(sep_ext, scal, r0, n, h, w):
    """2nd-order shear correction from an (n+2, w) extended sep block.

    ``sep_ext`` rows span global rows [r0-1, r0+n+1) (edge chunks carry a
    zero first/last row; the row-derivative is zeroed at the global image
    edge anyway, matching warp_affine_mxu's convention).
    """
    a00, a01 = scal[0], scal[1]
    a10, a11 = scal[3], scal[4]
    cy = (h - 1) * 0.5
    cx = (w - 1) * 0.5
    inv_ax = 1.0 / a00
    inv_ay = 1.0 / a11

    gi = _iota_col(n, float(r0))  # (n, 1)
    xs = _iota_row(w)  # (1, w)
    dx = a01 * (gi - cy)  # (n, 1) row-varying x displacement
    dy = a10 * (xs - cx)  # (1, w) col-varying y displacement

    sep = sep_ext[1:-1, :]
    # column shifts via static rolls (see _shift_cols); zero-edge columns
    # via the explicit edge mask, matching warp_affine_mxu's convention
    emask = ((xs > 0.5) & (xs < w - 1.5)).astype(jnp.float32)  # (1, w)
    right = _shift_cols(sep, 1, w)
    left = _shift_cols(sep, -1, w)
    gx = 0.5 * (right - left) * inv_ax * emask
    gxx = (right - 2.0 * sep + left) * (inv_ax * inv_ax) * emask
    up = sep_ext[:-2, :]
    down = sep_ext[2:, :]
    gy = 0.5 * (down - up) * inv_ay
    gyy = (down - 2.0 * sep + up) * (inv_ay * inv_ay)
    gxy = (
        0.25
        * (
            _shift_cols(down, 1, w)
            - _shift_cols(down, -1, w)
            - _shift_cols(up, 1, w)
            + _shift_cols(up, -1, w)
        )
        * (inv_ax * inv_ay)
        * emask
    )

    gmask = ((gi > 0.5) & (gi < h - 1.5)).astype(jnp.float32)  # (n, 1)
    gy = gy * gmask
    gyy = gyy * gmask
    gxy = gxy * gmask

    return (
        sep
        + dx * gx
        + dy * gy
        + 0.5 * dx * dx * gxx
        + dx * dy * gxy
        + 0.5 * dy * dy * gyy
    )


def _warp_kernel(scal_ref, img_ref, out_ref, *, band, order, h, w, out_dtype):
    b = pl.program_id(0)
    scal = [scal_ref[b, k] for k in range(6)]
    for r0, n in _row_chunks(h, _ROW_CHUNK):
        if order == 0:
            blk = _sep_rows_block(img_ref, scal, r0, n, band, h, w)
        else:
            lo = max(0, r0 - 1)
            hi = min(h, r0 + n + 1)
            ext = _sep_rows_block(img_ref, scal, lo, hi - lo, band, h, w)
            if r0 == 0:
                ext = jnp.concatenate(
                    [jnp.zeros((1, w), jnp.float32), ext], axis=0
                )
            if r0 + n == h:
                ext = jnp.concatenate(
                    [ext, jnp.zeros((1, w), jnp.float32)], axis=0
                )
            blk = _taylor_correct(ext, scal, r0, n, h, w)
        out_ref[0, r0 : r0 + n, :] = blk.astype(out_dtype)


def _warp_scalars(warp):
    # row-major 2x3 -> [a00, a01, tx, a10, a11, ty] per batch element
    return warp.astype(jnp.float32).reshape(-1, 6)


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("band", "order", "interpret"))
def _warp_banded_batched(imgs, warps, band, order, interpret):
    b, h, w = imgs.shape
    kern = functools.partial(
        _warp_kernel, band=band, order=order, h=h, w=w, out_dtype=imgs.dtype
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w), imgs.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        # whole-image residency + double buffering exceeds the default
        # 16 MB scoped-vmem budget at 1 MP; the chip has far more VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(_warp_scalars(warps), imgs)


def warp_displacement_bound(warp: jax.Array, h: int, w: int) -> jax.Array:
    """Worst-case |sample displacement| (px, L-inf over x/y) of an affine
    warp over an (h, w) image — the on-device certificate for the banded
    kernels' contract.

    The displacement field d(x, y) = W @ [x, y, 1] - (x, y) of an affine
    warp is itself affine in (x, y), so each component's extrema over the
    image rectangle are attained at the four corners: four dot products,
    exact, O(1).  ``warp_affine_banded`` / ``make_warp_filter`` /
    ``ecc_gn_moments`` resample EXACTLY while this bound stays <=
    DEFAULT_BAND and read ZERO beyond it (the same convention as walking
    off the image).  The phase-1 driver records the bound in telemetry
    column 4 and re-runs any frame whose bound exceeds the band through
    the dense ``warp_affine_mxu`` path, so a high-vibration frame can
    never silently zero-sample (reference contract: the dense cv2-style
    warp is displacement-unlimited, registration.cpp:63-80).
    """
    corners = jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [0.0, h - 1.0], [w - 1.0, h - 1.0]],
        jnp.float32,
    )
    wf = warp.astype(jnp.float32)
    pos = corners @ wf[:, :2].T + wf[:, 2]
    return jnp.abs(pos - corners).max()


@jax.custom_batching.custom_vmap
def warp_affine_banded(img: jax.Array, warp: jax.Array) -> jax.Array:
    """Banded Pallas warp: out(y, x) = img(W @ [x, y, 1]), order-2 Taylor.

    Drop-in for ``warp_affine_mxu(img, warp, order=2)`` for near-identity +
    bounded-translation warps (|sample displacement| < DEFAULT_BAND px
    everywhere; beyond-band displacements sample as zero).  vmaps over a
    leading frame batch into the kernel's batch grid dimension.
    """
    return _warp_banded_batched(
        img[None], warp[None], DEFAULT_BAND, 2, _use_interpret()
    )[0]


@warp_affine_banded.def_vmap
def _warp_banded_vmap(axis_size, in_batched, img, warp):
    img_b, warp_b = in_batched
    if not img_b:
        img = jnp.broadcast_to(img, (axis_size,) + img.shape)
    if not warp_b:
        warp = jnp.broadcast_to(warp, (axis_size,) + warp.shape)
    out = _warp_banded_batched(img, warp, DEFAULT_BAND, 2, _use_interpret())
    return out, True


# ---------------------------------------------------------------------------
# Fused tail: final output warp + separable smoothing filter in one kernel


def _warp_filter_kernel(scal_ref, img_ref, out_ref, warped_ref=None, *, band,
                        h, w, taps, out_dtype):
    """blur_k(warp_order2(img)) per row chunk, one HBM read + one write.

    The warped image (cv2 BORDER_CONSTANT zero outside) is smoothed with the
    separable ``taps`` filter under reflect-101 borders (cv2.GaussianBlur /
    cv2.blur parity, ops/image.py) — the tail of the per-frame program
    (psp_process.cpp:1797-1805 order: register -> [patch] -> filter) without
    materializing the intermediate warped image in HBM.  Vertical pass from a
    row halo, horizontal pass via static rolls with per-edge reflect
    corrections.
    """
    b = pl.program_id(0)
    scal = [scal_ref[b, k] for k in range(6)]
    ksize = len(taps)
    r = ksize // 2
    for r0, n in _row_chunks(h, _ROW_CHUNK):
        # warped rows [r0-r, r0+n+r): separable block with a +-1 Taylor halo
        lo = max(0, r0 - r - 1)
        hi = min(h, r0 + n + r + 1)
        ext = _sep_rows_block(img_ref, scal, lo, hi - lo, band, h, w)
        if lo > r0 - r - 1:
            ext = jnp.concatenate(
                [jnp.zeros((lo - (r0 - r - 1), w), jnp.float32), ext], axis=0
            )
        if hi < r0 + n + r + 1:
            ext = jnp.concatenate(
                [ext, jnp.zeros((r0 + n + r + 1 - hi, w), jnp.float32)],
                axis=0,
            )
        iw_ext = _taylor_correct(ext, scal, r0 - r, n + 2 * r, h, w)
        if warped_ref is not None:
            # pre-filter warped rows (already resident): the patch-correction
            # path samples boundary pixels from THIS image at static indices
            # (apply_patches semantics) — a dynamic-position bilinear sample
            # instead measured ~109 us/frame of scalar gathers at 1 MP
            warped_ref[0, r0 : r0 + n, :] = iw_ext[r : r + n, :].astype(
                out_dtype
            )
        # reflect-101 vertical halo at the image edges: global row -j mirrors
        # row j, row h-1+j mirrors row h-1-j (static row swaps; out-of-image
        # rows were zero/garbage from the warp halo and must not leak into
        # the blur)
        if r0 == 0:
            pieces = [iw_ext[r + j : r + j + 1] for j in range(r, 0, -1)]
            iw_ext = jnp.concatenate(pieces + [iw_ext[r:]], axis=0)
        if r0 + n == h:
            top = n - 1 + r  # local index of global row h-1 when r0+n == h
            pieces = [iw_ext[top - j : top - j + 1] for j in range(1, r + 1)]
            iw_ext = jnp.concatenate([iw_ext[: top + 1]] + pieces, axis=0)

        # vertical pass
        bv = jnp.zeros((n, w), jnp.float32)
        for j in range(ksize):
            bv = bv + float(taps[j]) * iw_ext[j : j + n, :]
        # horizontal pass: base shifted sums (zero beyond edges) ...
        out = jnp.zeros((n, w), jnp.float32)
        for j in range(ksize):
            out = out + float(taps[j]) * _shift_cols(bv, j - r, w)
        # ... plus reflect-101 corrections at the first/last r columns
        xs = _iota_row(w)
        for d in range(1, r + 1):
            for x in range(d):
                # left: tap at column x+(-d) < 0 reflects to column d-x
                off = d - 2 * x  # (d - x) - x
                m = (xs == float(x)).astype(jnp.float32)
                out = out + float(taps[r - d]) * m * _shift_cols(bv, off, w)
                # right: tap at column (w-1-x)+d >= w reflects to w-1-d+x
                off2 = 2 * x - d
                m2 = (xs == float(w - 1 - x)).astype(jnp.float32)
                out = out + float(taps[r + d]) * m2 * _shift_cols(bv, off2, w)
        out_ref[0, r0 : r0 + n, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("taps", "with_warped", "interpret")
)
def _warp_filter_batched(imgs, warps, taps, with_warped, interpret):
    b, h, w = imgs.shape
    kern = functools.partial(
        _warp_filter_kernel, band=DEFAULT_BAND, h=h, w=w, taps=taps,
        out_dtype=imgs.dtype,
    )
    img_spec = pl.BlockSpec(
        (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b, h, w), imgs.dtype)
    return pl.pallas_call(
        kern,
        out_shape=(out_shape, out_shape) if with_warped else out_shape,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), img_spec],
        out_specs=(img_spec, img_spec) if with_warped else img_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(_warp_scalars(warps), imgs)


def filter_taps(filter_type: str, ksize: int):
    """Static separable tap tuple for the tail kernel (None = unsupported)."""
    if filter_type == "gaussian":
        from upsp_tpu.ops.image import gaussian_kernel_1d

        if ksize > 7:  # keep the static roll/correction count bounded
            return None
        return tuple(float(t) for t in gaussian_kernel_1d(ksize))
    if filter_type == "box":
        if ksize > 7:
            return None
        return tuple(1.0 / ksize for _ in range(ksize))
    if filter_type == "none":
        return ()
    return None


class _WarpFilterVmap:
    """vmap-able wrapper binding the static taps (custom_vmap needs a fixed
    positional signature, so the taps ride on the instance).

    ``with_warped=True`` also returns the pre-filter warped image (second
    output) for the static-index patch-correction sampling.
    """

    def __init__(self, taps, with_warped: bool = False):
        self.taps = taps
        self.with_warped = with_warped
        fn = jax.custom_batching.custom_vmap(self._call)
        fn.def_vmap(self._vmap)
        self._fn = fn

    def _run(self, imgs, warps):
        return _warp_filter_batched(
            imgs, warps, self.taps, self.with_warped, _use_interpret()
        )

    def _call(self, img, warp):
        out = self._run(img[None], warp[None])
        return jax.tree.map(lambda a: a[0], out)

    def _vmap(self, axis_size, in_batched, img, warp):
        img_b, warp_b = in_batched
        if not img_b:
            img = jnp.broadcast_to(img, (axis_size,) + img.shape)
        if not warp_b:
            warp = jnp.broadcast_to(warp, (axis_size,) + warp.shape)
        out = self._run(img, warp)
        return out, jax.tree.map(lambda a: True, out)

    def __call__(self, img, warp):
        if not self.taps:
            iw = warp_affine_banded(img, warp)
            return (iw, iw) if self.with_warped else iw
        return self._fn(img, warp)


@functools.lru_cache(maxsize=None)
def make_warp_filter(taps, with_warped: bool = False) -> _WarpFilterVmap:
    """Cached vmap-able (img, warp) -> filtered-warped callable for ``taps``."""
    return _WarpFilterVmap(taps, with_warped)


# ---------------------------------------------------------------------------
# Fused GN statistics


def _moments_kernel(scal_ref, iw_ref, tmpl_ref, out_ref, *, h, w, chunk):
    """Accumulate the 42 GN statistics over row chunks of (iw, tmpl).

    Every mean-coupled sum is taken over BRIGHTNESS-SHIFTED fields
    (u - K, with K ~ the template mean, scal[12]): the zero-mean statistics
    are algebraically invariant to a constant shift, but the raw-moment
    expansion ``corr = S_ti - S_t S_i / area`` cancels ~mean^2/cov digits
    of f32 without it (measured 23% error on uncorrelated synthetic data;
    <1e-4 with the shift).
    """
    b = pl.program_id(0)
    a00 = scal_ref[b, 0]
    a01 = scal_ref[b, 1]
    a10 = scal_ref[b, 3]
    a11 = scal_ref[b, 4]
    inv_det = 1.0 / (a00 * a11 - a01 * a10)
    ms = [scal_ref[b, 6 + k] for k in range(6)]
    kshift = scal_ref[b, 12]

    cy = (h - 1) * 0.5
    xs = _iota_row(w)  # (1, w)
    x_sep_m = ms[0] * xs + ms[2] + ms[1] * cy
    mx = ((x_sep_m >= 0.0) & (x_sep_m <= w - 1.0)).astype(jnp.float32)
    xs2 = xs * xs
    emask = ((xs > 0.5) & (xs < w - 1.5)).astype(jnp.float32)

    acc = []  # per-chunk lists of 27 (n, 1) row partials
    for r0, n in _row_chunks(h, chunk):
        gi = _iota_col(n, float(r0))  # (n, 1)
        gmask = ((gi > 0.5) & (gi < h - 1.5)).astype(jnp.float32)

        iw = iw_ref[0, r0 : r0 + n, :].astype(jnp.float32) - kshift
        tm = tmpl_ref[r0 : r0 + n, :].astype(jnp.float32) - kshift

        up = iw_ref[0, max(0, r0 - 1) : r0 + n - 1, :].astype(jnp.float32)
        down = iw_ref[0, r0 + 1 : min(h, r0 + n + 1), :].astype(jnp.float32)
        if r0 == 0:
            up = jnp.concatenate([jnp.zeros((1, w), jnp.float32), up], axis=0)
        if r0 + n == h:
            down = jnp.concatenate(
                [down, jnp.zeros((1, w), jnp.float32)], axis=0
            )
        acc.append(
            _moment_partials(
                iw, up, down, tm, gi, xs, xs2, emask, gmask, mx, ms, h, w,
                inv_det, a00, a01, a10, a11,
            )
        )

    out_ref[0, :, :] = _contract_rows(acc, h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments_batched(iws, tmpl, scal, interpret):
    b, h, w = iws.shape
    kern = functools.partial(_moments_kernel, h=h, w=w, chunk=_ROW_CHUNK)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scal, iws, tmpl)


@jax.custom_batching.custom_vmap
def ecc_gn_moments(iw: jax.Array, tmpl: jax.Array, warp: jax.Array,
                   mask_warp: jax.Array) -> jax.Array:
    """(128,) raw GN statistics of one warped image against the template.

    Layout: [0:18] Hessian moments ([xx,xy,yy,x,y,1] for gxx,gxy,gyy),
    [18:24] raw template projections, [24:30] raw image projections,
    [30:36] raw mask projections, [36:42] scalar sums
    [area, S_t, S_i, S_tt, S_ii, S_ti], rest zero.  See
    ``ecc_statistics_from_moments``.
    """
    kshift = jnp.mean(tmpl).astype(jnp.float32).reshape(1, 1)
    scal = jnp.concatenate(
        [_warp_scalars(warp), _warp_scalars(mask_warp), kshift,
         jnp.zeros((1, 3), jnp.float32)], axis=1
    )
    return _moments_batched(iw[None], tmpl, scal, _use_interpret())[0, 0]


@ecc_gn_moments.def_vmap
def _moments_vmap(axis_size, in_batched, iw, tmpl, warp, mask_warp):
    iw_b, tmpl_b, warp_b, mask_b = in_batched
    if tmpl_b:
        raise NotImplementedError("batched templates unsupported")
    if not iw_b:
        iw = jnp.broadcast_to(iw, (axis_size,) + iw.shape)
    if not warp_b:
        warp = jnp.broadcast_to(warp, (axis_size,) + warp.shape)
    if not mask_b:
        mask_warp = jnp.broadcast_to(
            mask_warp, (axis_size,) + mask_warp.shape
        )
    b = iw.shape[0]
    kshift = jnp.broadcast_to(
        jnp.mean(tmpl).astype(jnp.float32).reshape(1, 1), (b, 1)
    )
    scal = jnp.concatenate(
        [_warp_scalars(warp), _warp_scalars(mask_warp), kshift,
         jnp.zeros((b, 3), jnp.float32)], axis=1
    )
    return _moments_batched(iw, tmpl, scal, _use_interpret())[:, 0, :], True


# ---------------------------------------------------------------------------
# Hot-pixel repair: median-of-4-neighbors replacement as ONE HBM pass


def _hot_kernel(img_ref, out_ref, *, h, w, thresh, min_change, max_hot,
                out_dtype):
    """``ops.image.fix_hot_pixels`` semantics (cv_extras.cpp:230-272 role):
    replace pixels >= thresh by their 4-neighbor median when the drop
    exceeds min_change, unless more than max_hot pixels look hot.

    Two VMEM passes over the resident image: the global hot count first
    (row partials only — scalar accumulator chains are a Mosaic compile
    pathology), then the masked replacement.
    """
    big = 3.0e38

    def load(sl):
        v = img_ref[0, sl, :]
        if jnp.issubdtype(v.dtype, jnp.unsignedinteger):
            # Mosaic has no direct uint16 -> f32 cast; hop through int32
            v = v.astype(jnp.int32)
        return v.astype(jnp.float32)

    def store(v):
        if jnp.issubdtype(out_dtype, jnp.unsignedinteger):
            return v.astype(jnp.int32).astype(out_dtype)
        return v.astype(out_dtype)

    def neighbors(r0, n):
        x = load(slice(r0, r0 + n))
        up = load(slice(max(0, r0 - 1), r0 + n - 1))
        down = load(slice(r0 + 1, min(h, r0 + n + 1)))
        if r0 == 0:
            up = jnp.concatenate([jnp.full((1, w), big, jnp.float32), up],
                                 axis=0)
        if r0 + n == h:
            down = jnp.concatenate(
                [down, jnp.full((1, w), big, jnp.float32)], axis=0
            )
        xs = _iota_row(w)
        lmask = (xs >= 1.0).astype(jnp.float32)
        rmask = (xs <= w - 2.0).astype(jnp.float32)
        left = _shift_cols(x, -1, w) + (1.0 - lmask) * big
        right = _shift_cols(x, 1, w) + (1.0 - rmask) * big
        return x, up, down, left, right

    counts = []
    for r0, n in _row_chunks(h, _ROW_CHUNK):
        x = load(slice(r0, r0 + n))
        counts.append(
            jnp.sum((x >= thresh).astype(jnp.float32), axis=1, keepdims=True)
        )
    n_hot = jnp.sum(jnp.concatenate(counts, axis=0))
    ok = (n_hot <= max_hot).astype(jnp.float32)

    for r0, n in _row_chunks(h, _ROW_CHUNK):
        x, up, down, left, right = neighbors(r0, n)
        n_valid = (
            4.0
            - (up >= big).astype(jnp.float32)
            - (down >= big).astype(jnp.float32)
            - (left >= big).astype(jnp.float32)
            - (right >= big).astype(jnp.float32)
        )
        lo1 = jnp.minimum(up, down)
        hi1 = jnp.maximum(up, down)
        lo2 = jnp.minimum(left, right)
        hi2 = jnp.maximum(left, right)
        mid_lo = jnp.maximum(lo1, lo2)
        mid_hi = jnp.minimum(hi1, hi2)
        s2 = jnp.minimum(mid_lo, mid_hi)
        s3 = jnp.maximum(mid_lo, mid_hi)
        median = jnp.where(n_valid == 4.0, s3, s2)
        replace = (
            (x >= thresh).astype(jnp.float32)
            * ((x - median) > min_change).astype(jnp.float32)
            * ok
        )
        out = jnp.where(replace > 0.0, median, x)
        out_ref[0, r0 : r0 + n, :] = store(out)


@functools.partial(
    jax.jit, static_argnames=("thresh", "min_change", "max_hot", "interpret")
)
def _hot_batched(imgs, thresh, min_change, max_hot, interpret):
    b, h, w = imgs.shape
    out_dtype = imgs.dtype
    kern = functools.partial(
        _hot_kernel, h=h, w=w, thresh=float(thresh),
        min_change=float(min_change), max_hot=float(max_hot),
        out_dtype=out_dtype,
    )
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w), out_dtype),
        grid=(b,),
        in_specs=[spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(imgs)


@jax.custom_batching.custom_vmap
def fix_hot_pixels_pallas(img: jax.Array) -> jax.Array:
    """Drop-in for ``ops.image.fix_hot_pixels`` default thresholds."""
    return _hot_batched(img[None], 4064, 512, 5, _use_interpret())[0]


@fix_hot_pixels_pallas.def_vmap
def _hot_vmap(axis_size, in_batched, img):
    if not in_batched[0]:
        img = jnp.broadcast_to(img, (axis_size,) + img.shape)
    return _hot_batched(img, 4064, 512, 5, _use_interpret()), True


# ---------------------------------------------------------------------------
# Plain separable blur (no warp): the ECC pre-blur as ONE HBM pass


def _blur_kernel(img_ref, out_ref, *, h, w, taps, out_dtype):
    """Separable reflect-101 blur, whole image resident, one read + write.

    XLA lowers ``gaussian_blur`` to two full HBM passes (pad/concat + two
    1-D convolutions, ~30 us/frame measured at 1 MP); here both passes stay
    in VMEM per row chunk.
    """
    ksize = len(taps)
    r = ksize // 2
    for r0, n in _row_chunks(h, _ROW_CHUNK):
        # rows [r0-r, r0+n+r) with reflect-101 at the image edges
        rows = []
        for g in range(r0 - r, r0 + n + r):
            gg = -g if g < 0 else (2 * (h - 1) - g if g >= h else g)
            rows.append((g, gg))
        # contiguous interior block + small mirrored strips at the edges
        lo = max(0, r0 - r)
        hi = min(h, r0 + n + r)
        blk = img_ref[0, lo:hi, :].astype(jnp.float32)
        pre = [
            img_ref[0, gg : gg + 1, :].astype(jnp.float32)
            for g, gg in rows
            if g < 0
        ]
        post = [
            img_ref[0, gg : gg + 1, :].astype(jnp.float32)
            for g, gg in rows
            if g >= h
        ]
        ext = jnp.concatenate(pre + [blk] + post, axis=0) if (pre or post) else blk

        bv = jnp.zeros((n, w), jnp.float32)
        for j in range(ksize):
            bv = bv + float(taps[j]) * ext[j : j + n, :]
        out = jnp.zeros((n, w), jnp.float32)
        for j in range(ksize):
            out = out + float(taps[j]) * _shift_cols(bv, j - r, w)
        xs = _iota_row(w)
        for d in range(1, r + 1):
            for x in range(d):
                off = d - 2 * x
                m = (xs == float(x)).astype(jnp.float32)
                out = out + float(taps[r - d]) * m * _shift_cols(bv, off, w)
                off2 = 2 * x - d
                m2 = (xs == float(w - 1 - x)).astype(jnp.float32)
                out = out + float(taps[r + d]) * m2 * _shift_cols(bv, off2, w)
        out_ref[0, r0 : r0 + n, :] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def _blur_batched(imgs, taps, interpret):
    b, h, w = imgs.shape
    kern = functools.partial(
        _blur_kernel, h=h, w=w, taps=taps, out_dtype=imgs.dtype
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, w), imgs.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(imgs)


class _BlurVmap:
    """vmap-able gaussian/box blur kernel bound to static taps."""

    def __init__(self, taps):
        self.taps = taps
        fn = jax.custom_batching.custom_vmap(self._call)
        fn.def_vmap(self._vmap)
        self._fn = fn

    def _call(self, img):
        return _blur_batched(img[None], self.taps, _use_interpret())[0]

    def _vmap(self, axis_size, in_batched, img):
        if not in_batched[0]:
            # unbatched input (e.g. the ECC template under a frame vmap):
            # blur ONCE and broadcast the result, not the work
            out = _blur_batched(img[None], self.taps, _use_interpret())[0]
            return jnp.broadcast_to(out, (axis_size,) + out.shape), True
        return _blur_batched(img, self.taps, _use_interpret()), True

    def __call__(self, img):
        if not self.taps:
            return img
        return self._fn(img)


@functools.lru_cache(maxsize=None)
def make_blur(taps) -> _BlurVmap:
    """Cached vmap-able blur callable for the static ``taps`` tuple."""
    return _BlurVmap(taps)


# ---------------------------------------------------------------------------
# Fused GN step: warp + gradients + statistics in ONE pass over (img, tmpl)


def _moment_partials(iw, up, down, tm, gi, xs, xs2, emask, gmask,
                     mx, ms, h, w, inv_det, a00, a01, a10, a11):
    """The 27 (n, 1) row partials of the GN statistics for one row chunk.

    ``iw``/``tm`` are brightness-shifted fields; ``up``/``down`` are the
    unshifted warped rows one above/below (the constant cancels in the
    central difference).  Shared by the standalone moments kernel and the
    fused GN-step kernel.
    """
    cx = (w - 1) * 0.5
    y_sep_m = ms[4] * gi + ms[5] + ms[3] * cx
    my = ((y_sep_m >= 0.0) & (y_sep_m <= h - 1.0)).astype(jnp.float32)

    gix = 0.5 * (_shift_cols(iw, 1, w) - _shift_cols(iw, -1, w)) * emask
    giy = 0.5 * (down - up) * gmask

    m = my * mx  # (n, w) via broadcast
    gx = (a11 * gix - a10 * giy) * inv_det * m
    gy = (-a01 * gix + a00 * giy) * inv_det * m

    # ONLY lane reductions per chunk: 27 (n, 1) row partials.  The
    # cross-row contraction happens once after the loop — a scalar
    # accumulator per statistic per chunk builds scalar dependency
    # chains that Mosaic takes >10 minutes to compile.
    part = []
    # 9: fields gxx, gxy, gyy against lanes {1, x, x^2}
    for f in (gx * gx, gx * gy, gy * gy):
        part.append(jnp.sum(f, axis=1, keepdims=True))
        part.append(jnp.sum(f * xs, axis=1, keepdims=True))
        part.append(jnp.sum(f * xs2, axis=1, keepdims=True))
    # 12: projections for z in (tmpl, iw, 1) against lanes {1, x}
    for z in (tm, iw, None):
        gxz = gx if z is None else gx * z
        gyz = gy if z is None else gy * z
        part.append(jnp.sum(gxz, axis=1, keepdims=True))
        part.append(jnp.sum(gxz * xs, axis=1, keepdims=True))
        part.append(jnp.sum(gyz, axis=1, keepdims=True))
        part.append(jnp.sum(gyz * xs, axis=1, keepdims=True))
    # 6: masked scalar sums
    tmm = tm * m
    iwm = iw * m
    for f in (m, tmm, iwm, tmm * tm, iwm * iw, tmm * iw):
        part.append(jnp.sum(f, axis=1, keepdims=True))
    return part


def _contract_rows(acc, h):
    """27 lists of per-chunk (n, 1) partials -> (1, 8, 128) stats block."""
    full = [
        jnp.concatenate([chunkpart[k] for chunkpart in acc], axis=0)
        for k in range(27)
    ]
    ys = _iota_col(h)
    ys2 = ys * ys
    vals = []
    for q in range(3):  # Hessian moments: [xx, xy, yy, x, y, 1]
        h0, h1, h2 = full[3 * q], full[3 * q + 1], full[3 * q + 2]
        vals += [
            jnp.sum(h2), jnp.sum(h1 * ys), jnp.sum(h0 * ys2),
            jnp.sum(h1), jnp.sum(h0 * ys), jnp.sum(h0),
        ]
    for zi in range(3):  # projections: [gx x, gy x, gx y, gy y, gx, gy] . z
        p0x, p1x, p0y, p1y = full[9 + 4 * zi : 9 + 4 * zi + 4]
        vals += [
            jnp.sum(p1x), jnp.sum(p1y), jnp.sum(p0x * ys),
            jnp.sum(p0y * ys), jnp.sum(p0x), jnp.sum(p0y),
        ]
    for k in range(21, 27):  # area, S_t, S_i, S_tt, S_ii, S_ti
        vals.append(jnp.sum(full[k]))

    row = jnp.concatenate(
        [jnp.stack(vals).reshape(1, 42), jnp.zeros((1, 86), jnp.float32)],
        axis=1,
    )
    # (1, 8, 128) output block: a (1, 128) row block violates the TPU
    # (8, 128)-tile divisibility rule, so the stats ride in sublane 0
    return jnp.concatenate([row, jnp.zeros((7, 128), jnp.float32)], axis=0)


def _gn_fused_kernel(scal_ref, img_ref, tmpl_ref, out_ref, *, band, h, w,
                     chunk):
    """One GN step's complete statistics straight from the UNWARPED image.

    Per row chunk: banded order-2 warp of rows [r0-1, r0+n+1) (the +-1 halo
    feeds the row gradient), then the same 27 row partials as
    ``_moments_kernel`` — the warped image never exists outside VMEM, saving
    the standalone warp kernel's HBM write plus the moments kernel's reload
    (8 MB/frame/step at 1 MP) and one kernel launch per step.

    MEASURED SLOWER than the split warp+moments pair on this chip (75 vs 69
    us/step at 1 MP, device profile 2026-08-20): the combined body's VMEM/
    register pressure costs more ILP than the saved HBM round-trip buys.
    Kept (tested, bitwise-equal to the split pair) as the documented
    measured-and-rejected variant; production uses the split kernels
    (registration.py body_pallas).
    """
    b = pl.program_id(0)
    scal = [scal_ref[b, k] for k in range(6)]
    a00, a01 = scal[0], scal[1]
    a10, a11 = scal[3], scal[4]
    inv_det = 1.0 / (a00 * a11 - a01 * a10)
    ms = [scal_ref[b, 6 + k] for k in range(6)]
    kshift = scal_ref[b, 12]

    cy = (h - 1) * 0.5
    xs = _iota_row(w)  # (1, w)
    x_sep_m = ms[0] * xs + ms[2] + ms[1] * cy
    mx = ((x_sep_m >= 0.0) & (x_sep_m <= w - 1.0)).astype(jnp.float32)
    xs2 = xs * xs
    emask = ((xs > 0.5) & (xs < w - 1.5)).astype(jnp.float32)

    acc = []
    for r0, n in _row_chunks(h, chunk):
        # warped rows [r0-1, r0+n+1): separable block [r0-2, r0+n+2) with
        # zero rows where the halo leaves the image (matching the
        # BORDER_CONSTANT convention), then the order-2 Taylor correction
        lo = max(0, r0 - 2)
        hi = min(h, r0 + n + 2)
        ext = _sep_rows_block(img_ref, scal, lo, hi - lo, band, h, w)
        if lo > r0 - 2:
            ext = jnp.concatenate(
                [jnp.zeros((lo - (r0 - 2), w), jnp.float32), ext], axis=0
            )
        if hi < r0 + n + 2:
            ext = jnp.concatenate(
                [ext, jnp.zeros((r0 + n + 2 - hi, w), jnp.float32)], axis=0
            )
        iw_ext = _taylor_correct(ext, scal, r0 - 1, n + 2, h, w)
        # rows -1 / h of the halo are out of image: zero them explicitly
        # (the moments kernel's zero-pad convention; gmask kills their giy
        # contribution anyway, this keeps the central difference identical)
        if r0 == 0:
            iw_ext = jnp.concatenate(
                [jnp.zeros((1, w), jnp.float32), iw_ext[1:]], axis=0
            )
        if r0 + n == h:
            iw_ext = jnp.concatenate(
                [iw_ext[:-1], jnp.zeros((1, w), jnp.float32)], axis=0
            )

        gi = _iota_col(n, float(r0))  # (n, 1)
        gmask = ((gi > 0.5) & (gi < h - 1.5)).astype(jnp.float32)
        iw = iw_ext[1:-1, :] - kshift
        tm = tmpl_ref[r0 : r0 + n, :].astype(jnp.float32) - kshift
        acc.append(
            _moment_partials(
                iw, iw_ext[:-2, :], iw_ext[2:, :], tm, gi, xs, xs2, emask,
                gmask, mx, ms, h, w, inv_det, a00, a01, a10, a11,
            )
        )

    out_ref[0, :, :] = _contract_rows(acc, h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gn_fused_batched(imgs, tmpl, scal, interpret):
    b, h, w = imgs.shape
    kern = functools.partial(
        _gn_fused_kernel, band=DEFAULT_BAND, h=h, w=w, chunk=_ROW_CHUNK
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scal, imgs, tmpl)


def _gn_scal(warp, mask_warp, kshift_row):
    return jnp.concatenate(
        [_warp_scalars(warp), _warp_scalars(mask_warp), kshift_row,
         jnp.zeros((kshift_row.shape[0], 3), jnp.float32)], axis=1
    )


@jax.custom_batching.custom_vmap
def ecc_gn_fused(img: jax.Array, tmpl: jax.Array, warp: jax.Array,
                 mask_warp: jax.Array) -> jax.Array:
    """Fused GN step: ``ecc_gn_moments(warp_affine_banded(img, warp), ...)``
    in one kernel — same (128,) raw-statistics layout, the warped image
    stays VMEM-resident.  ``img`` is the UNWARPED (blurred) input."""
    kshift = jnp.mean(tmpl).astype(jnp.float32).reshape(1, 1)
    scal = _gn_scal(warp[None], mask_warp[None], kshift)
    return _gn_fused_batched(img[None], tmpl, scal, _use_interpret())[0, 0]


@ecc_gn_fused.def_vmap
def _gn_fused_vmap(axis_size, in_batched, img, tmpl, warp, mask_warp):
    img_b, tmpl_b, warp_b, mask_b = in_batched
    if tmpl_b:
        raise NotImplementedError("batched templates unsupported")
    if not img_b:
        img = jnp.broadcast_to(img, (axis_size,) + img.shape)
    if not warp_b:
        warp = jnp.broadcast_to(warp, (axis_size,) + warp.shape)
    if not mask_b:
        mask_warp = jnp.broadcast_to(mask_warp, (axis_size,) + mask_warp.shape)
    b = img.shape[0]
    kshift = jnp.broadcast_to(
        jnp.mean(tmpl).astype(jnp.float32).reshape(1, 1), (b, 1)
    )
    scal = _gn_scal(warp, mask_warp, kshift)
    return _gn_fused_batched(img, tmpl, scal, _use_interpret())[:, 0, :], True


def ecc_statistics_from_moments(mom: jax.Array):
    """Reconstruct the quantities the ECC GN update needs from raw moments.

    Returns (Hmat (6,6), i_proj, t_proj, iw_norm2, corr, tmpl_norm, area).
    Zero-mean expansion for a binary mask m (m^2 = m) and
    z = (u - mean_m(u)) m:
      proj(z) = proj_raw(u) - mean_m(u) proj_raw(1)
      sum(z_a z_b) = S_ab - S_a S_b / area
    """
    hm = mom[0:18].reshape(3, 6)  # rows: gxx, gxy, gyy moments
    p_t = mom[18:24]
    p_i = mom[24:30]
    p_1 = mom[30:36]
    area = jnp.maximum(mom[36], 1.0)
    s_t, s_i, s_tt, s_ii, s_ti = mom[37], mom[38], mom[39], mom[40], mom[41]

    a_xx, a_xy, a_yy, a_x, a_y, a_1 = [hm[0, k] for k in range(6)]
    b_xx, b_xy, b_yy, b_x, b_y, b_1 = [hm[1, k] for k in range(6)]
    c_xx, c_xy, c_yy, c_x, c_y, c_1 = [hm[2, k] for k in range(6)]
    Hmat = jnp.array(
        [
            [a_xx, b_xx, a_xy, b_xy, a_x, b_x],
            [b_xx, c_xx, b_xy, c_xy, b_x, c_x],
            [a_xy, b_xy, a_yy, b_yy, a_y, b_y],
            [b_xy, c_xy, b_yy, c_yy, b_y, c_y],
            [a_x, b_x, a_y, b_y, a_1, b_1],
            [b_x, c_x, b_y, c_y, b_1, c_1],
        ],
        jnp.float32,
    )
    t_mean = s_t / area
    i_mean = s_i / area
    t_proj = p_t - t_mean * p_1
    i_proj = p_i - i_mean * p_1
    iw_norm2 = s_ii - s_i * s_i / area
    corr = s_ti - s_t * s_i / area
    tmpl_norm = jnp.maximum(
        jnp.sqrt(jnp.maximum(s_tt - s_t * s_t / area, 0.0)), 1e-12
    )
    return Hmat, i_proj, t_proj, iw_norm2, corr, tmpl_norm, area
