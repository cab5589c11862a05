"""Device unpack kernel vs host unpacker (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from upsp_tpu.io.video.util import pack_12bpp, unpack_12bpp
from upsp_tpu.ops.pallas_unpack import (
    unpack_12bpp_device,
    unpack_12bpp_jnp,
    unpack_frames_12bpp,
)


class TestDeviceUnpack:
    def test_jnp_matches_host(self, rng):
        pix = rng.integers(0, 4096, 2 * 32768).astype(np.uint16)
        buf = pack_12bpp(pix)
        out = np.array(unpack_12bpp_jnp(jnp.asarray(buf)))
        np.testing.assert_array_equal(out, unpack_12bpp(buf))

    def test_pallas_interpret_matches(self, rng):
        pix = rng.integers(0, 4096, 2 * 32768).astype(np.uint16)
        buf = pack_12bpp(pix)
        out = np.array(unpack_12bpp_device(jnp.asarray(buf), interpret=True))
        np.testing.assert_array_equal(out, unpack_12bpp(buf))

    def test_non_multiple_block(self, rng):
        # G not a multiple of the kernel block: padding path
        pix = rng.integers(0, 4096, 2 * 1000).astype(np.uint16)
        buf = pack_12bpp(pix)
        out = np.array(unpack_12bpp_device(jnp.asarray(buf), interpret=True))
        np.testing.assert_array_equal(out, pix)

    def test_frames_reshape(self, rng):
        H, W, F = 8, 16, 3
        pix = rng.integers(0, 4096, F * H * W).astype(np.uint16)
        buf = pack_12bpp(pix)
        frames = np.array(unpack_frames_12bpp(jnp.asarray(buf), H, W, F))
        np.testing.assert_array_equal(frames, pix.reshape(F, H, W))
