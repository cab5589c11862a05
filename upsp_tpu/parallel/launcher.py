"""Multi-host launch: jax.distributed init + per-host work slicing.

The reference runs under PBS with `mpiexec psp_process` on 20-50 nodes
(docs/md/upsp-swdd.md:307-312); here a pod slice initializes through
``jax.distributed`` (coordinator address + process id from env or arguments)
and each host reads only its own video-frame slice — the same contiguous
apportioning as the reference's per-rank reads (psp_process.cpp:867-908),
with device-level sharding handled by the mesh (upsp_tpu.parallel.mesh).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

log = logging.getLogger("upsp_tpu.launcher")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX; returns (process_id, process_count).

    Arguments default to JAX's standard env vars / cloud auto-detection; on a
    single host this is a no-op returning (0, 1).
    """
    import jax

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit or os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def host_frame_slice(n_frames: int, process_id: int, process_count: int):
    """This host's contiguous frame block (start, count) — apportion parity."""
    from upsp_tpu.parallel.mesh import apportion

    return apportion(n_frames, process_count)[process_id]


def host_reads_for_datapoint(cfg, process_id: int, process_count: int):
    """Open this host's video slice: returns (readers, start, count).

    Each host decodes only its own block of frames — video ingest bandwidth
    scales with hosts like the reference's per-rank read-ahead.
    """
    from upsp_tpu.pipeline.run import open_videos

    readers, n_frames, start0 = open_videos(cfg)
    start, count = host_frame_slice(n_frames, process_id, process_count)
    return readers, start0 + start, count
