"""On-device packed-pixel unpacking (Pallas kernel + jnp fallback).

Raw high-speed video is 12-bit packed (1.5 bytes/pixel).  Unpacking on the
*device* means the host->HBM transfer ships packed bytes — 25% less PCIe/DMA
traffic per frame than pre-unpacked uint16 — and the VPU does the bit
shuffling at memory speed.  Layout: the host views the packed buffer as
(G, 3) byte triplets and transposes to (3, G) so the lane dimension is large
(TPU uint8 tiling wants wide trailing axes; see pallas_guide tiling table).

The Pallas path runs on TPU; :func:`unpack_12bpp_jnp` is the identical math in
plain jnp (used as the CPU/interpret fallback and as the test oracle against
the host unpacker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unpack12_kernel(b_ref, out_ref):
    """(3, L) uint8 byte planes -> (2, L) uint16 pixel planes (MSBits first).

    Bit math runs in int32 — Mosaic has no 16-bit vector shifts on this
    generation — and narrows on the store.
    """
    b0 = b_ref[0, :].astype(jnp.int32)
    b1 = b_ref[1, :].astype(jnp.int32)
    b2 = b_ref[2, :].astype(jnp.int32)
    out_ref[0, :] = ((b0 << 4) | (b1 >> 4)).astype(jnp.uint16)
    out_ref[1, :] = (((b1 & 0x0F) << 8) | b2).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def unpack_12bpp_device(packed: jax.Array, interpret: bool = False) -> jax.Array:
    """Packed 12-bit buffer (3G,) uint8 -> (2G,) uint16 pixels, on device."""
    from jax.experimental import pallas as pl

    n_bytes = packed.shape[0]
    G = n_bytes // 3
    planes = packed[: G * 3].reshape(G, 3).T  # (3, G)

    BL = 32768
    pad = (-G) % BL
    if pad:
        planes = jnp.pad(planes, ((0, 0), (0, pad)))
    Gp = planes.shape[1]

    out = pl.pallas_call(
        _unpack12_kernel,
        out_shape=jax.ShapeDtypeStruct((2, Gp), jnp.uint16),
        grid=(Gp // BL,),
        in_specs=[pl.BlockSpec((3, BL), lambda i: (0, i))],
        out_specs=pl.BlockSpec((2, BL), lambda i: (0, i)),
        interpret=interpret,
    )(planes)
    return out[:, :G].T.reshape(2 * G)


def _unpack10_kernel(b_ref, out_ref):
    """(5, L) uint8 byte planes -> (4, L) uint16 pixel planes (MSBits first)."""
    b0 = b_ref[0, :].astype(jnp.int32)
    b1 = b_ref[1, :].astype(jnp.int32)
    b2 = b_ref[2, :].astype(jnp.int32)
    b3 = b_ref[3, :].astype(jnp.int32)
    b4 = b_ref[4, :].astype(jnp.int32)
    out_ref[0, :] = ((b0 << 2) | (b1 >> 6)).astype(jnp.uint16)
    out_ref[1, :] = (((b1 & 0x3F) << 4) | (b2 >> 4)).astype(jnp.uint16)
    out_ref[2, :] = (((b2 & 0x0F) << 6) | (b3 >> 2)).astype(jnp.uint16)
    out_ref[3, :] = (((b3 & 0x03) << 8) | b4).astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def unpack_10bpp_device(packed: jax.Array, interpret: bool = False) -> jax.Array:
    """Packed 10-bit buffer (5G,) uint8 -> (4G,) uint16 pixels, on device."""
    from jax.experimental import pallas as pl

    n_bytes = packed.shape[0]
    G = n_bytes // 5
    planes = packed[: G * 5].reshape(G, 5).T  # (5, G)

    BL = 32768
    pad = (-G) % BL
    if pad:
        planes = jnp.pad(planes, ((0, 0), (0, pad)))
    Gp = planes.shape[1]

    out = pl.pallas_call(
        _unpack10_kernel,
        out_shape=jax.ShapeDtypeStruct((4, Gp), jnp.uint16),
        grid=(Gp // BL,),
        in_specs=[pl.BlockSpec((5, BL), lambda i: (0, i))],
        out_specs=pl.BlockSpec((4, BL), lambda i: (0, i)),
        interpret=interpret,
    )(planes)
    return out[:, :G].T.reshape(4 * G)


@jax.jit
def unpack_10bpp_jnp(packed: jax.Array) -> jax.Array:
    """Identical math in plain jnp (CPU fallback / oracle)."""
    G = packed.shape[0] // 5
    b = packed[: G * 5].reshape(G, 5).astype(jnp.uint16)
    p0 = (b[:, 0] << 2) | (b[:, 1] >> 6)
    p1 = ((b[:, 1] & 0x3F) << 4) | (b[:, 2] >> 4)
    p2 = ((b[:, 2] & 0x0F) << 6) | (b[:, 3] >> 2)
    p3 = ((b[:, 3] & 0x03) << 8) | b[:, 4]
    return jnp.stack([p0, p1, p2, p3], axis=1).reshape(4 * G)


@jax.jit
def unpack_12bpp_jnp(packed: jax.Array) -> jax.Array:
    """Identical math in plain jnp (CPU fallback / oracle)."""
    G = packed.shape[0] // 3
    b = packed[: G * 3].reshape(G, 3).astype(jnp.uint16)
    hi = (b[:, 0] << 4) | (b[:, 1] >> 4)
    lo = ((b[:, 1] & 0x0F) << 8) | b[:, 2]
    return jnp.stack([hi, lo], axis=1).reshape(2 * G)


def unpack_frames_12bpp(
    packed: jax.Array, height: int, width: int, n_frames: int
) -> jax.Array:
    """Packed multi-frame buffer -> (F, H, W) uint16, staying on device."""
    try:
        pix = unpack_12bpp_device(packed)
    except Exception:  # Mosaic unavailable (CPU tests) -> same math in XLA
        pix = unpack_12bpp_jnp(packed)
    return pix[: n_frames * height * width].reshape(n_frames, height, width)
