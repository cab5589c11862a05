"""Device mesh + shardings: the SPMD substrate replacing MPI ranks.

The reference is a frames x nodes 2-D block decomposition over MPI ranks with
one global transpose, reductions, and broadcasts (SURVEY.md section 2.3).  Here:

- phase 1 shards the *frame* axis of the video/intensity tensors over the mesh,
- phase 2 shards the *node* axis,
- the MPI Isend/Recv global transpose (psp_process.cpp:707-771) is a single
  sharding-constraint change on the transposed array — XLA emits the
  all-to-all over ICI,
- MPI_Reduce(SUM) of avg/rms partials becomes jnp.mean/psum under the same
  sharding,
- phase-0 "replicate everywhere" is just replicated sharding.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


FRAMES_AXIS = "frames"


def make_mesh(devices: Optional[Sequence] = None, axis: str = FRAMES_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; the axis carries frames or nodes."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """(F, ...) arrays: frames block-distributed (apportion() equivalent)."""
    return NamedSharding(mesh, P(FRAMES_AXIS))


def node_sharding(mesh: Mesh) -> NamedSharding:
    """(N, ...) arrays: nodes block-distributed (phase-2 layout)."""
    return NamedSharding(mesh, P(FRAMES_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_frames(mesh: Mesh, array: jax.Array) -> jax.Array:
    return jax.device_put(array, frame_sharding(mesh))


@functools.partial(jax.jit, static_argnames=("mesh",))
def global_transpose(mesh: Mesh, intensity: jax.Array) -> jax.Array:
    """Frames-major (F, N) frame-sharded  ->  node-major (N, F) node-sharded.

    This is the reference's global_transpose / upsp_matrix_transpose collective
    (psp_process.cpp:707-771, cpp/exec/upsp_matrix_transpose.cpp) expressed as
    one resharding constraint; XLA lowers it to an all-to-all over ICI.
    """
    t = intensity.T  # (N, F)
    return jax.lax.with_sharding_constraint(t, node_sharding(mesh))


def apportion(total: int, ranks: int) -> list:
    """Contiguous block sizes per rank (reference apportion, psp_process.cpp:611).

    Kept for host-side IO splitting (per-host video reads / file writes).
    """
    base = total // ranks
    rem = total % ranks
    sizes = [base + (1 if r < rem else 0) for r in range(ranks)]
    starts = [sum(sizes[:r]) for r in range(ranks)]
    return list(zip(starts, sizes))


def pad_to_multiple(array: jax.Array, axis: int, multiple: int, value=0.0):
    """Pad an axis up to a device-count multiple (frames rarely divide evenly)."""
    size = array.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return array, size
    pad = [(0, 0)] * array.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(array, pad, constant_values=value), size
