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


class TestPackedChunkProcessor:
    def test_matches_host_decode_path(self):
        """Fused unpack+phase1 == host decode then phase1, exactly."""
        import jax.numpy as jnp

        from upsp_tpu.io.video.util import pack_12bpp
        from upsp_tpu.pipeline.phase1 import (
            make_packed_chunk_processor,
            process_frames,
        )
        from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

        state = make_synthetic_state(
            n_cameras=2, image_hw=(64, 96), grid_shape=(24, 20),
            n_patch_dots=3, registration="none",
        )
        frames = make_frame_batch(state, n_frames=3)
        # quantize to the 12-bit camera domain so packing round-trips exactly
        q = np.clip(np.round(frames), 0, 4095).astype(np.uint16)
        packed = np.stack(
            [
                np.stack([pack_12bpp(q[f, c].reshape(-1)) for c in range(q.shape[1])])
                for f in range(q.shape[0])
            ]
        )  # (F, C, B) uint8
        fn = make_packed_chunk_processor(state, use_pallas=False)
        got = np.asarray(fn(jnp.asarray(packed)))
        want = np.asarray(process_frames(state, jnp.asarray(q)))
        np.testing.assert_array_equal(got, want)


class TestUnpack10:
    def test_jnp_matches_host(self, rng):
        import jax.numpy as jnp

        from upsp_tpu.io.video.util import pack_10bpp, unpack_10bpp
        from upsp_tpu.ops.pallas_unpack import unpack_10bpp_jnp

        pix = rng.integers(0, 1024, size=4 * 5000).astype(np.uint16)
        buf = pack_10bpp(pix)
        got = np.asarray(unpack_10bpp_jnp(jnp.asarray(buf)))
        np.testing.assert_array_equal(got, unpack_10bpp(buf))

    def test_kernel_interpret_matches_jnp(self, rng):
        import jax.numpy as jnp

        from upsp_tpu.ops.pallas_unpack import (
            unpack_10bpp_device,
            unpack_10bpp_jnp,
        )

        buf = rng.integers(0, 256, size=5 * 40000, dtype=np.uint8)
        got = np.asarray(unpack_10bpp_device(jnp.asarray(buf), interpret=True))
        want = np.asarray(unpack_10bpp_jnp(jnp.asarray(buf)))
        np.testing.assert_array_equal(got, want)

    def test_packed_processor_10bit_with_lut(self):
        """10-bit packed chunk + companding LUT == host-decoded path."""
        import jax.numpy as jnp

        from upsp_tpu.io.video.cine import LUT_10_TO_12
        from upsp_tpu.io.video.util import pack_10bpp
        from upsp_tpu.pipeline.phase1 import (
            make_packed_chunk_processor,
            process_frames,
        )
        from upsp_tpu.pipeline.synthetic import make_frame_batch, make_synthetic_state

        state = make_synthetic_state(
            n_cameras=1, image_hw=(64, 96), grid_shape=(24, 20),
            n_patch_dots=3, registration="none",
        )
        frames = make_frame_batch(state, n_frames=2)
        # 10-bit camera domain
        q10 = np.clip(np.round(frames / 4.0), 0, 1023).astype(np.uint16)
        packed = np.stack(
            [
                np.stack([pack_10bpp(q10[f, c].reshape(-1)) for c in range(q10.shape[1])])
                for f in range(q10.shape[0])
            ]
        )
        fn = make_packed_chunk_processor(
            state, use_pallas=False, packed_bits=10, lut=LUT_10_TO_12
        )
        got = np.asarray(fn(jnp.asarray(packed)))
        want = np.asarray(
            process_frames(state, jnp.asarray(LUT_10_TO_12[q10].astype(np.uint16)))
        )
        np.testing.assert_array_equal(got, want)
