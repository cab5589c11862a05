"""Tracing/profiling utilities: scope timers + pipeline stage checkpoints.

Replaces the reference's psp::BlockTimer (cpp/include/utils/pspTimer.h) and
timedBarrierPoint (psp_process.cpp:583-606): every pipeline stage logs
total-elapsed / since-previous, and on multi-process runs the barrier wait is
reported separately (load-imbalance signal).  Device work can additionally be
traced with jax.profiler via :func:`trace`.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional, Tuple

log = logging.getLogger("upsp_tpu.timing")


class BlockTimer:
    """RAII-style scope timer: logs elapsed wall time on exit."""

    def __init__(self, label: str, enabled: bool = True):
        self.label = label
        self.enabled = enabled
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.enabled:
            log.info("%s: %.3f s", self.label, self.elapsed)


class StageClock:
    """timedBarrierPoint equivalent: labeled stage checkpoints.

    Records (label, total elapsed, since previous, barrier wait).  On
    multi-process runs, pass a barrier callable (e.g. a tiny psum) so the wait
    component isolates load imbalance like the reference's MPI_Barrier timing.
    """

    def __init__(self, barrier=None, enabled: bool = True):
        self.t_start = time.perf_counter()
        self.t_prev = self.t_start
        self.barrier = barrier
        self.enabled = enabled
        self.records: List[Tuple[str, float, float, float]] = []

    def point(self, label: str) -> None:
        t_before = time.perf_counter()
        if self.barrier is not None:
            self.barrier()
        t_after = time.perf_counter()
        rec = (
            label,
            t_after - self.t_start,
            t_after - self.t_prev,
            t_after - t_before,
        )
        self.records.append(rec)
        self.t_prev = t_after
        if self.enabled:
            log.info(
                "[stage] %-40s total %8.3f s  step %8.3f s  barrier %6.3f s",
                *rec,
            )

    def summary(self) -> str:
        lines = [f"{'stage':40s} {'total':>10s} {'step':>10s} {'barrier':>8s}"]
        for label, total, step, wait in self.records:
            lines.append(f"{label:40s} {total:10.3f} {step:10.3f} {wait:8.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_barrier():
    """A tiny collective suitable as a StageClock barrier on multi-host runs."""
    import jax
    import jax.numpy as jnp

    jnp.zeros(()).block_until_ready()
    if jax.process_count() > 1:
        # round-trip through a global reduction to synchronize hosts
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("upsp_stage")
