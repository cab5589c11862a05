"""Native library tests (skipped gracefully when the .so isn't built)."""

import os
import subprocess

import numpy as np
import pytest

from upsp_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        rc = subprocess.run(["make", "-C", os.path.join(REPO, "cpp")]).returncode
        if rc != 0 or not native.available():
            pytest.skip("native library unavailable and could not be built")


class TestUnpack:
    def test_12bpp_matches_numpy(self, rng):
        from upsp_tpu.io.video.util import pack_12bpp, unpack_12bpp

        pix = rng.integers(0, 4096, 4096).astype(np.uint16)
        buf = pack_12bpp(pix).tobytes()
        np.testing.assert_array_equal(native.unpack_12bpp(buf), unpack_12bpp(buf))

    def test_10bpp_matches_numpy(self, rng):
        from upsp_tpu.io.video.util import pack_10bpp, unpack_10bpp

        pix = rng.integers(0, 1024, 4096).astype(np.uint16)
        buf = pack_10bpp(pix).tobytes()
        np.testing.assert_array_equal(native.unpack_10bpp(buf), unpack_10bpp(buf))


class TestNativeBVH:
    def test_matches_python_traversal(self, rng):
        import jax.numpy as jnp

        from upsp_tpu.ops.raycast import (
            brute_force_intersect,
            bvh_intersect,
            bvh_to_device,
        )

        verts = rng.normal(size=(80, 3)).astype(np.float32)
        tris = rng.integers(0, 80, size=(120, 3)).astype(np.int32)
        ok = (
            (tris[:, 0] != tris[:, 1])
            & (tris[:, 1] != tris[:, 2])
            & (tris[:, 0] != tris[:, 2])
        )
        tris = tris[ok]
        flat = native.build_bvh(verts, tris, leaf_size=4)
        assert sorted(flat.tri_id.tolist()) == sorted(range(tris.shape[0]))
        bvh = bvh_to_device(flat)
        origins = rng.normal(size=(200, 3)).astype(np.float32) * 3
        dirs = rng.normal(size=(200, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        t_b, _, hit_b = bvh_intersect(bvh, jnp.asarray(origins), jnp.asarray(dirs),
                                      max_leaf=flat.max_leaf_count)
        v0 = jnp.asarray(verts[tris[:, 0]])
        e1 = jnp.asarray(verts[tris[:, 1]] - verts[tris[:, 0]])
        e2 = jnp.asarray(verts[tris[:, 2]] - verts[tris[:, 0]])
        t_o, _, hit_o = brute_force_intersect(v0, e1, e2, jnp.asarray(origins),
                                              jnp.asarray(dirs))
        np.testing.assert_array_equal(np.array(hit_b), np.array(hit_o))
        np.testing.assert_allclose(
            np.array(t_b)[np.array(hit_b)], np.array(t_o)[np.array(hit_o)],
            rtol=2e-5,
        )

    def test_sah_build_same_hits(self, rng):
        """SAH-bucket build (reference pspRT.cpp:499-525 objective) returns
        a different tree but identical closest hits."""
        import jax.numpy as jnp

        from upsp_tpu.ops.raycast import bvh_intersect, bvh_to_device

        verts = rng.normal(size=(120, 3)).astype(np.float32)
        tris = rng.integers(0, 120, size=(200, 3)).astype(np.int32)
        ok = (
            (tris[:, 0] != tris[:, 1])
            & (tris[:, 1] != tris[:, 2])
            & (tris[:, 0] != tris[:, 2])
        )
        tris = tris[ok]
        med = native.build_bvh(verts, tris, leaf_size=4, method="median")
        sah = native.build_bvh(verts, tris, leaf_size=4, method="sah")
        assert sorted(sah.tri_id.tolist()) == sorted(range(tris.shape[0]))
        assert (sah.leaf_count[sah.leaf_start >= 0] >= 1).all()
        origins = rng.normal(size=(150, 3)).astype(np.float32) * 3
        dirs = rng.normal(size=(150, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        t_m, p_m, h_m = bvh_intersect(
            bvh_to_device(med), jnp.asarray(origins), jnp.asarray(dirs),
            max_leaf=med.max_leaf_count,
        )
        t_s, p_s, h_s = bvh_intersect(
            bvh_to_device(sah), jnp.asarray(origins), jnp.asarray(dirs),
            max_leaf=sah.max_leaf_count,
        )
        np.testing.assert_array_equal(np.array(h_m), np.array(h_s))
        hm = np.array(h_m)
        np.testing.assert_allclose(
            np.array(t_m)[hm], np.array(t_s)[hm], rtol=2e-5
        )
        # prim ids are original triangle ids in both layouts: same winner
        np.testing.assert_array_equal(
            np.array(p_m)[hm], np.array(p_s)[hm]
        )


class TestTranspose:
    def test_native_transpose(self, tmp_path, rng):
        rows, cols = 37, 23
        data = rng.normal(size=(rows, cols)).astype("<f4")
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        data.tofile(src)
        native.transpose_f32(src, dst, rows, cols, block=8)
        out = np.fromfile(dst, "<f4").reshape(cols, rows)
        np.testing.assert_array_equal(out, data.T)


class TestAsyncWriter:
    def test_ordered_writes(self, tmp_path, rng):
        path = str(tmp_path / "out.bin")
        blocks = [rng.normal(size=64).astype("<f4") for _ in range(8)]
        with native.AsyncWriter(path) as w:
            for i, b in enumerate(blocks):
                w.submit(i * 256, b)
        out = np.fromfile(path, "<f4").reshape(8, 64)
        for i, b in enumerate(blocks):
            np.testing.assert_array_equal(out[i], b)

    @pytest.mark.slow
    def test_single_submit_beyond_kernel_write_cap(self, tmp_path, rng):
        """One submit > 2^31 bytes: pwrite is capped at ~2 GiB per call, so
        the worker MUST loop on partial writes (a 65k-node x 50k-frame
        phase-2 block is ~13 GB in one submit; regression for the endurance
        run that died with 'async writes reported errors')."""
        import shutil

        if shutil.disk_usage(tmp_path).free < 6 << 30:
            pytest.skip("needs ~3 GB of scratch disk")
        path = str(tmp_path / "big.bin")
        n = (2_300_000_000) // 8  # ~2.3 GB, just over the cap
        data = np.arange(n, dtype=np.int64)
        with native.AsyncWriter(path) as w:
            w.submit(0, data)
        assert os.path.getsize(path) == data.nbytes
        # memmap readback: a full np.fromfile would double peak RAM to ~4.6GB
        got = np.memmap(path, np.int64, mode="r")
        np.testing.assert_array_equal(np.asarray(got[:4]), data[:4])
        np.testing.assert_array_equal(np.asarray(got[-4:]), data[-4:])
        del got
        os.remove(path)

    def test_out_of_order_offsets(self, tmp_path, rng):
        path = str(tmp_path / "ooo.bin")
        a = rng.normal(size=16).astype("<f4")
        b = rng.normal(size=16).astype("<f4")
        with native.AsyncWriter(path) as w:
            w.submit(64, b)
            w.submit(0, a)
        out = np.fromfile(path, "<f4")
        np.testing.assert_array_equal(out[:16], a)
        np.testing.assert_array_equal(out[16:32], b)
