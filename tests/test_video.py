"""Video reader tests: pack/unpack round-trips + the real .mraw fixture."""

import pathlib

import numpy as np
import pytest

from upsp_tpu.io.video import (
    FramePrefetcher,
    MrawReader,
    pack_10bpp,
    pack_12bpp,
    unpack_10bpp,
    unpack_12bpp,
    video_reader,
)

MRAW_DIR = pathlib.Path("/root/reference/cpp/test/mraw")


class TestPacking:
    def test_12bpp_roundtrip(self, rng):
        pix = rng.integers(0, 4096, size=512).astype(np.uint16)
        back = unpack_12bpp(pack_12bpp(pix))
        np.testing.assert_array_equal(back, pix)

    def test_10bpp_roundtrip(self, rng):
        pix = rng.integers(0, 1024, size=512).astype(np.uint16)
        back = unpack_10bpp(pack_10bpp(pix))
        np.testing.assert_array_equal(back, pix)

    def test_12bpp_known_bytes(self):
        # 0xABC, 0xDEF packed MSBit-first -> AB CD EF
        buf = bytes([0xAB, 0xCD, 0xEF])
        np.testing.assert_array_equal(unpack_12bpp(buf), [0xABC, 0xDEF])

    def test_10bpp_known_bytes(self):
        # pixels 0b1010101010 x4 -> bytes 10101010|10 101010...
        pix = np.array([0b1010101010] * 4, np.uint16)
        buf = pack_10bpp(pix)
        np.testing.assert_array_equal(unpack_10bpp(buf), pix)


@pytest.mark.skipif(not MRAW_DIR.exists(), reason="mraw fixture unavailable")
class TestMraw:
    def test_read_fixture(self):
        with MrawReader(str(MRAW_DIR / "12bitMRAW.mraw")) as vid:
            assert vid.bit_depth == 12
            assert vid.frame_count >= 1
            img = vid.read_frame(0)
            assert img.shape == (vid.height, vid.width)
            assert img.dtype == np.uint16
            assert img.max() < 4096
            assert img.max() > 0

    def test_matches_reference_reader(self):
        """Oracle check against the reference's own pure-Python reader."""
        import sys

        sys.path.insert(0, "/root/reference/python")
        try:
            from upsp.video.mraw import MrawReader as RefReader
        except ImportError:
            pytest.skip("reference python reader not importable")
        finally:
            sys.path.pop(0)
        path = str(MRAW_DIR / "12bitMRAW.mraw")
        with MrawReader(path) as ours, RefReader(path) as ref:
            assert ours.frame_count == ref.frame_count
            for idx in range(min(3, ours.frame_count)):
                np.testing.assert_array_equal(
                    ours.read_frame(idx), ref.read_frame(idx)
                )

    def test_dispatch(self):
        vid = video_reader(str(MRAW_DIR / "12bitMRAW.mraw"))
        with vid:
            assert vid.read_frame(0) is not None

    def test_prefetcher(self):
        with MrawReader(str(MRAW_DIR / "12bitMRAW.mraw")) as vid:
            n = min(vid.frame_count, 4)
            chunks = list(FramePrefetcher(vid, n, frames_per_chunk=2))
            total = sum(c.shape[0] for c in chunks)
            assert total == n
            direct = vid.read_frames(n)
            np.testing.assert_array_equal(np.concatenate(chunks), direct)


class TestCine:
    def test_synthetic_cine_roundtrip(self, tmp_path, rng):
        """Write a minimal uncompressed cine and read it back."""
        import struct

        H, W, F = 8, 16, 3
        frames = rng.integers(0, 4096, size=(F, H, W)).astype(np.uint16)
        path = tmp_path / "synth.cine"
        setup_size = 7240
        off_image_header = 44
        off_setup = off_image_header + 40
        off_tagged = off_setup + setup_size
        off_offsets = off_tagged
        data_start = off_offsets + 8 * F
        with open(path, "wb") as f:
            f.write(
                struct.pack(
                    "<HHHHiIiIIIIII",
                    0x4943, 44, 0, 1, 0, F, 0, F,
                    off_image_header, off_setup, off_offsets, 0, 0,
                )
            )
            f.write(struct.pack("<IiiHHIIiiII", 40, W, H, 1, 16, 0,
                                H * W * 2, 0, 0, 0, 0))
            setup = bytearray(setup_size)
            struct.pack_into("<H", setup, 142, setup_size)
            struct.pack_into("<H", setup, 737, W)
            struct.pack_into("<H", setup, 739, H)
            struct.pack_into("<I", setup, 768, 10000)  # fps
            struct.pack_into("<I", setup, 1568, 5000)  # shutter ns
            struct.pack_into("<I", setup, 896, 12)  # RealBPP
            f.write(setup)
            img_bytes = H * W * 2
            offsets = [
                data_start + i * (8 + img_bytes) for i in range(F)
            ]
            f.write(struct.pack(f"<{F}q", *offsets))
            for i in range(F):
                f.write(struct.pack("<I", 8))  # annotation size (incl. hdr)
                f.write(struct.pack("<I", img_bytes))
                f.write(frames[i].astype("<u2").tobytes())

        from upsp_tpu.io.video import CineReader

        with CineReader(str(path)) as vid:
            assert vid.frame_count == F
            assert (vid.height, vid.width) == (H, W)
            assert vid.frame_rate == 10000
            assert vid.bit_depth == 12
            for i in range(F):
                np.testing.assert_array_equal(vid.read_frame(i), frames[i])


class TestPackedReads:
    """Raw-packed-byte path feeding the on-device unpack kernel."""

    @pytest.mark.skipif(not MRAW_DIR.exists(), reason="mraw fixture unavailable")
    def test_mraw_packed_matches_decoded(self):
        with MrawReader(str(MRAW_DIR / "12bitMRAW.mraw")) as vid:
            assert vid.supports_packed_reads
            n = min(vid.frame_count, 3)
            packed = vid.read_packed_frames(n)
            assert packed.shape == (n, vid.packed_frame_nbytes)
            assert packed.dtype == np.uint8
            decoded = unpack_12bpp(packed.reshape(-1)).reshape(
                n, vid.height, vid.width
            )
            np.testing.assert_array_equal(decoded, vid.read_frames(n))

    @pytest.mark.skipif(not MRAW_DIR.exists(), reason="mraw fixture unavailable")
    def test_packed_prefetcher(self):
        with MrawReader(str(MRAW_DIR / "12bitMRAW.mraw")) as vid:
            n = min(vid.frame_count, 4)
            chunks = list(
                FramePrefetcher(vid, n, frames_per_chunk=2, packed=True)
            )
            got = np.concatenate(chunks)
            np.testing.assert_array_equal(got, vid.read_packed_frames(n))

    def test_cine_packed_payload(self, tmp_path, rng):
        """Packed (compression=1) cine: packed bytes match decoded frames."""
        import struct

        H, W, F = 8, 16, 2
        frames = rng.integers(0, 4096, size=(F, H, W)).astype(np.uint16)
        path = tmp_path / "packed.cine"
        setup_size = 7240
        off_image_header = 44
        off_setup = off_image_header + 40
        off_offsets = off_setup + setup_size
        data_start = off_offsets + 8 * F
        img_bytes = H * W * 3 // 2
        with open(path, "wb") as f:
            f.write(
                struct.pack(
                    "<HHHHiIiIIIIII",
                    0x4943, 44, 0, 1, 0, F, 0, F,
                    off_image_header, off_setup, off_offsets, 0, 0,
                )
            )
            # biCompression=1 -> packed
            f.write(struct.pack("<IiiHHIIiiII", 40, W, H, 1, 12, 1,
                                img_bytes, 0, 0, 0, 0))
            setup = bytearray(setup_size)
            struct.pack_into("<H", setup, 142, setup_size)
            struct.pack_into("<H", setup, 737, W)
            struct.pack_into("<H", setup, 739, H)
            struct.pack_into("<I", setup, 768, 10000)
            struct.pack_into("<I", setup, 1568, 5000)
            struct.pack_into("<I", setup, 896, 12)
            f.write(setup)
            offsets = [data_start + i * (8 + img_bytes) for i in range(F)]
            f.write(struct.pack(f"<{F}q", *offsets))
            for i in range(F):
                f.write(struct.pack("<I", 8))
                f.write(struct.pack("<I", img_bytes))
                f.write(pack_12bpp(frames[i].reshape(-1)).tobytes())

        from upsp_tpu.io.video import CineReader

        with CineReader(str(path)) as vid:
            assert vid.supports_packed_reads
            for i in range(F):
                np.testing.assert_array_equal(vid.read_frame(i), frames[i])
            packed = vid.read_packed_frames(F)
            decoded = unpack_12bpp(packed.reshape(-1)).reshape(F, H, W)
            np.testing.assert_array_equal(decoded, frames)


class TestCineLUT:
    def test_exact_vendor_table(self):
        """Exact 10->12-bit linearization table (vendor data asset)."""
        from upsp_tpu.io.video.cine import LUT_10_TO_12

        assert LUT_10_TO_12.shape == (1024,)
        assert LUT_10_TO_12.dtype == np.uint16
        # vendor anchor values
        assert LUT_10_TO_12[0] == 2
        assert LUT_10_TO_12[1] == 5
        assert LUT_10_TO_12[64] == 64
        assert LUT_10_TO_12[1014] == 4064
        assert (LUT_10_TO_12[1015:] == 4095).all()
        # monotone non-decreasing
        assert (np.diff(LUT_10_TO_12.astype(int)) >= 0).all()

    def test_matches_reference_table(self):
        """Bit-exact vs the reference reader's table when available."""
        import pathlib
        import sys

        ref = pathlib.Path("/root/reference/python")
        if not ref.exists():
            pytest.skip("reference unavailable")
        sys.path.insert(0, str(ref))
        try:
            from upsp.video.cine import _LUT_10BIT
        except ImportError:
            pytest.skip("reference cine module not importable")
        finally:
            sys.path.pop(0)
        from upsp_tpu.io.video.cine import LUT_10_TO_12

        np.testing.assert_array_equal(LUT_10_TO_12, np.asarray(_LUT_10BIT))
