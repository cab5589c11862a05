"""Phase 1: the fused per-frame program — register, patch, filter, project.

The reference's OpenMP frame loop (psp_process.cpp:1743-1851 — studied, not
copied) becomes ONE jitted function per frame stack: hot-pixel repair -> ECC
alignment to the first frame -> fiducial patching (batched MXU matmul) ->
Gaussian/box filter -> gather-projection -> multi-camera weighted sum ->
NaN-fill skipped nodes -> overlap adjustment.  ``jax.lax.map`` over the frame
axis keeps compile size constant; the frame axis shards across the device mesh
(see upsp_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from upsp_tpu.ops.image import apply_filter, fix_hot_pixels
from upsp_tpu.ops.patching import PatchOperator, apply_patches
from upsp_tpu.ops.projection import NodeProjection, project_frame
from upsp_tpu.ops.registration import ecc_affine, warp_affine
from upsp_tpu.ops.warp import warp_affine_mxu
from upsp_tpu.pipeline.phase0 import Phase0State


class Phase1Params(NamedTuple):
    """Static-shape pytree consumed by the jitted per-frame program."""

    projections: Tuple[NodeProjection, ...]  # per camera
    skipped: jax.Array  # (N,) bool
    patch_ops: Tuple[Optional[PatchOperator], ...]
    ref_frames: jax.Array  # (C, H, W) float32
    superseded_by: jax.Array  # (N,) int32


def phase1_params(state: Phase0State) -> Phase1Params:
    return Phase1Params(
        projections=tuple(state.projections),
        skipped=state.skipped,
        patch_ops=tuple(state.patch_ops),
        ref_frames=state.ref_frames,
        superseded_by=state.superseded_by,
    )


@functools.partial(
    jax.jit,
    static_argnames=("registration", "patch", "filter_type", "filter_size",
                     "interpolation", "adjust_overlap", "with_telemetry"),
)
def process_frame(
    frames: jax.Array,  # (C, H, W) raw camera frames (uint16 or float)
    params: Phase1Params,
    registration: str = "pixel",
    patch: bool = True,
    filter_type: str = "gaussian",
    filter_size: int = 3,
    interpolation: str = "linear",
    adjust_overlap: bool = True,
    with_telemetry: bool = False,
):
    """One multi-camera frame -> per-node intensity (N,).

    ``with_telemetry`` additionally returns a (C, 4) registration-quality
    record per camera: [rho, iterations, warp_tx, warp_ty] — the on-device
    analog of the reference's per-frame registration logging, at zero extra
    compute (all four values fall out of the ECC solve).
    """
    n_cams = frames.shape[0]
    sol = None
    telemetry = []
    for c in range(n_cams):
        img = fix_hot_pixels(frames[c])
        img = img.astype(jnp.float32)
        if registration == "pixel":
            warp, rho, iters = ecc_affine(
                params.ref_frames[c], img, return_iters=True
            )
            telemetry.append(
                jnp.stack([rho, iters.astype(jnp.float32), warp[0, 2], warp[1, 2]])
            )
            if interpolation == "nearest":
                img = warp_affine(img, warp, interpolation="nearest")
            else:
                img = warp_affine_mxu(img, warp)
        else:
            telemetry.append(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32))
        if patch and params.patch_ops[c] is not None:
            img = apply_patches(img, params.patch_ops[c])
        img = apply_filter(img, filter_type, filter_size)
        c_sol = project_frame(img, params.projections[c])
        sol = c_sol if sol is None else sol + c_sol
    sol = jnp.where(params.skipped, jnp.nan, sol)
    if adjust_overlap:
        sol = sol[params.superseded_by]
    if with_telemetry:
        return sol, jnp.stack(telemetry)
    return sol


def make_frame_processor(state: Phase0State, with_telemetry: bool = False):
    """Bind the phase-0 state + config into a frames->(N,) callable.

    ``with_telemetry``: fn returns (intensity, (C, 4) registration record).
    """
    p = phase1_params(state)
    cfg = state.config

    def fn(frames: jax.Array):
        return process_frame(
            frames,
            p,
            registration=cfg.registration,
            patch=(cfg.target_patcher == "polynomial"),
            filter_type=cfg.filter,
            filter_size=cfg.filter_size,
            interpolation=cfg.pixel_interpolation,
            with_telemetry=with_telemetry,
        )

    return fn


def make_packed_chunk_processor(
    state: Phase0State,
    use_pallas: bool = None,
    with_telemetry: bool = False,
    packed_bits: int = 12,
    lut=None,
):
    """Fused ingest: packed camera bytes unpack *on device* then run phase 1.

    Takes (F, C, B) uint8 packed chunks (B = packed_bits/8 * H * W
    bytes/frame) and returns (F, N) intensities in one jitted program.
    Shipping packed bytes instead of uint16 frames cuts host->HBM transfer by
    25% (12-bit) or 37.5% (10-bit) (the reference always unpacks on the host:
    cpp/lib/PSPVideo.cpp unpack role).  ``lut``: optional (2**packed_bits,)
    uint16 linearization table applied on device (cine 10->12 companding —
    a tiny gather XLA serves from VMEM).

    The Pallas kernel runs on TPU; elsewhere the identical jnp math is used
    (XLA fuses it into the ingest program).
    """
    import jax as _jax

    from upsp_tpu.ops.pallas_unpack import (
        unpack_10bpp_device,
        unpack_10bpp_jnp,
        unpack_12bpp_device,
        unpack_12bpp_jnp,
    )

    if packed_bits not in (10, 12):
        raise ValueError(f"packed_bits must be 10 or 12, got {packed_bits}")
    if use_pallas is None:
        use_pallas = _jax.default_backend() == "tpu"
    if packed_bits == 12:
        unpack = unpack_12bpp_device if use_pallas else unpack_12bpp_jnp
    else:
        unpack = unpack_10bpp_device if use_pallas else unpack_10bpp_jnp
    lut_dev = None if lut is None else jnp.asarray(lut, jnp.uint16)
    fn = make_frame_processor(state, with_telemetry=with_telemetry)
    h, w = state.image_hw

    @_jax.jit
    def process(packed: jax.Array):  # (F, C, B) uint8
        n_f, n_c = packed.shape[0], packed.shape[1]
        flat = packed.reshape(-1)
        pix = unpack(flat)
        if lut_dev is not None:
            pix = lut_dev[pix.astype(jnp.int32)]
        frames = pix.reshape(n_f, n_c, h, w)
        return jax.lax.map(fn, frames)

    return process


def process_frames(
    state: Phase0State, frames: jax.Array, batched: bool = True
) -> jax.Array:
    """(F, C, H, W) frame stack -> (F, N) intensities.

    ``lax.map`` serializes over frames inside one XLA program — per-frame
    intermediates (C full images + gradients) never exist for more than one
    frame at a time, which keeps HBM residency flat for long sequences.
    """
    fn = make_frame_processor(state)
    if not batched:
        return jnp.stack([fn(frames[i]) for i in range(frames.shape[0])])
    return jax.lax.map(fn, frames)


class Phase1Outputs(NamedTuple):
    intensity: jax.Array  # (F, N) — overlap-adjusted per-frame solutions
    sol_avg: jax.Array  # (N,) mean over frames (NaN where skipped)
    sol_rms: jax.Array  # (N,) root-mean-square over frames
    coverage: jax.Array  # (N,)


def phase1_statistics(intensity: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Frame-axis avg and rms (float32 accumulation in f64 like the reference).

    The reference accumulates partial sums in double to tame round-off
    (psp_process.cpp:1722-1730); on TPU we pairwise-sum in f32 which has
    comparable error for these lengths, and tests pin the tolerance.
    """
    avg = jnp.mean(intensity, axis=0)
    rms = jnp.sqrt(jnp.mean(intensity * intensity, axis=0))
    return avg, rms
