"""Sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from upsp_tpu.parallel.mesh import (
    apportion,
    frame_sharding,
    global_transpose,
    make_mesh,
    pad_to_multiple,
    shard_frames,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


class TestApportion:
    def test_even(self):
        blocks = apportion(16, 4)
        assert blocks == [(0, 4), (4, 4), (8, 4), (12, 4)]

    def test_remainder_goes_first(self):
        blocks = apportion(10, 4)
        sizes = [s for _, s in blocks]
        assert sizes == [3, 3, 2, 2]
        assert blocks[-1][0] + blocks[-1][1] == 10


class TestSharding:
    def test_frame_sharding_distributes(self, mesh, rng):
        x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        xs = shard_frames(mesh, x)
        assert xs.sharding.is_equivalent_to(frame_sharding(mesh), ndim=2)
        np.testing.assert_array_equal(np.array(xs), np.array(x))

    def test_global_transpose_correct(self, mesh, rng):
        f, n = 16, 24
        x = rng.normal(size=(f, n)).astype(np.float32)
        xs = shard_frames(mesh, jnp.asarray(x))
        t = global_transpose(mesh, xs)
        assert t.shape == (n, f)
        np.testing.assert_allclose(np.array(t), x.T)
        # result must be sharded over the node axis
        assert t.sharding.spec[0] == "frames"

    def test_sharded_computation_matches_single(self, mesh, rng):
        """A frame-sharded elementwise+reduce pipeline == unsharded result."""
        x = rng.normal(size=(16, 128)).astype(np.float32)

        @jax.jit
        def stats(a):
            avg = jnp.mean(a, axis=0)
            rms = jnp.sqrt(jnp.mean(a * a, axis=0))
            return avg, rms

        a1, r1 = stats(jnp.asarray(x))
        a2, r2 = stats(shard_frames(mesh, jnp.asarray(x)))
        # reduction order differs across shards -> f32 round-off differences
        np.testing.assert_allclose(np.array(a2), np.array(a1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.array(r2), np.array(r1), rtol=1e-5, atol=1e-6)

    def test_pad_to_multiple(self):
        x = jnp.ones((10, 3))
        padded, orig = pad_to_multiple(x, 0, 8)
        assert padded.shape == (16, 3)
        assert orig == 10
        np.testing.assert_array_equal(np.array(padded[10:]), 0.0)


class TestShardedPhase2:
    def test_phase2_node_sharded(self, mesh, rng):
        """Phase-2 conversion under node sharding matches unsharded."""
        from upsp_tpu.io.paint import PaintCalibration
        from upsp_tpu.io.wtd import TunnelConditions
        from upsp_tpu.ops.polyfit import make_detrender
        from upsp_tpu.pipeline.phase2 import (
            make_phase2_constants,
            phase2_convert,
        )

        n, f = 64, 32
        intensity = rng.uniform(1000, 3000, size=(n, f)).astype(np.float32)
        avg = intensity.mean(axis=1)
        cov = np.ones(n, np.float32)
        steady = np.zeros(n, np.float32)
        temp = np.full(n, 75.0, np.float32)
        const = make_phase2_constants(
            PaintCalibration(a=1.0), TunnelConditions(qbar=144.0, ps=500.0)
        )
        det = make_detrender(f, 6)

        out1 = phase2_convert(
            jnp.asarray(intensity), jnp.asarray(avg), jnp.asarray(cov),
            jnp.asarray(steady), jnp.asarray(temp), const, det,
        )
        sh = NamedSharding(mesh, P("frames"))
        out2 = phase2_convert(
            jax.device_put(jnp.asarray(intensity), sh),
            jax.device_put(jnp.asarray(avg), sh),
            jax.device_put(jnp.asarray(cov), sh),
            jax.device_put(jnp.asarray(steady), sh),
            jax.device_put(jnp.asarray(temp), sh),
            const,
            det,
        )
        np.testing.assert_allclose(
            np.array(out2.pressure_transpose),
            np.array(out1.pressure_transpose),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(np.array(out2.rms), np.array(out1.rms), rtol=2e-4)
