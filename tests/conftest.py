"""Test configuration: force an 8-device virtual CPU mesh for sharding tests.

Must set XLA flags before jax initializes — keep this at import time.
"""

import os

# Hard-force CPU for unit tests: fast compiles, float64 support, and a
# virtual 8-device mesh.  Benchmarks (bench.py) run on the real TPU instead.
# NOTE: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
# env var, so the config must be set through jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# x64 on for all tests: calibration math wants f64; device-path modules pin
# their own f32 dtypes explicitly, which this also verifies.
jax.config.update("jax_enable_x64", True)

import pathlib

import numpy as np
import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/test/data")


@pytest.fixture(scope="session")
def ref_data():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def fml_grid(ref_data):
    from upsp_tpu.io.plot3d import read_p3d_grid

    return read_p3d_grid(str(ref_data / "fml_tc3_volume.grid"))


@pytest.fixture(scope="session")
def fml_model(fml_grid):
    from upsp_tpu.geometry.grids import from_struct_grid

    # GRID_TOLERANCE from fml_tc3_volume.tgts header
    return from_struct_grid(fml_grid, tolerance=0.388202)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260817)
