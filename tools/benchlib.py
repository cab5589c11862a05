"""Honest device timing on the tunneled axon backend.

Two pathologies make naive timing wrong here (both measured, 2026-08-19):

1. ``block_until_ready`` under-waits: a ``fori_loop`` carrying a 34 MB array
   for 1024 iterations "completes" in 0.1 ms (impossible; ~700 TB/s), while
   the result only materializes when actually fetched.  Only a device->host
   fetch of output data reliably synchronizes.
2. A fetch costs a full tunnel round trip (~25 ms), which buries anything
   measured in microseconds-to-milliseconds.

The fix is AMORTIZED FINAL-FETCH DIFFERENCING: dispatch R independent
invocations (TPU streams execute in order, so fetching the LAST output
forces all R), and difference two rep counts so the RTT + sync overhead
cancel exactly:

    per_call = (t(R2) - t(R1)) / (R2 - R1)

This also reflects production throughput: the streaming driver keeps many
chunks in flight, so pipelined dispatch is the deployment-relevant number.

Use distinct input buffers per rep (uploaded once, reused round-robin) so a
caching layer anywhere in the tunnel can't dedupe identical dispatches.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np


def force_fetch(out) -> float:
    """Fetch one element of (the first leaf of) ``out`` — a real sync."""
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def run_stream(fn: Callable, inputs: Sequence, reps: int) -> None:
    """Dispatch ``reps`` calls round-robin over ``inputs``; fetch the last."""
    outs = None
    for i in range(reps):
        outs = fn(inputs[i % len(inputs)])
    force_fetch(outs)


def per_call_seconds(
    fn: Callable,
    inputs: Sequence,
    r1: int = 2,
    r2: int = 8,
    trials: int = 3,
) -> float:
    """Amortized per-invocation wall time of ``fn`` (min over trials)."""
    run_stream(fn, inputs, r1)  # warmup / compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        run_stream(fn, inputs, r1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_stream(fn, inputs, r2)
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (r2 - r1))
    return best


def chained_cost(
    make_fn: Callable[[int], Callable],
    inputs: Sequence,
    k1: int,
    k2: int,
    reps: int = 4,
    trials: int = 3,
) -> float:
    """Marginal cost of one chained application inside a jitted program.

    ``make_fn(K)`` returns a jitted fn applying the measured op K times
    (e.g. via ``lax.fori_loop`` with the array as carry, which forces the
    carry through HBM each iteration — a Python-unrolled chain fuses into
    one register-resident kernel even across ``optimization_barrier`` and
    measures nothing).  Cost = (t(K2) - t(K1)) / (K2 - K1), each t itself
    amortized over ``reps`` dispatches with one final fetch.
    """
    f1, f2 = make_fn(k1), make_fn(k2)
    run_stream(f1, inputs, reps)
    run_stream(f2, inputs, reps)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        run_stream(f1, inputs, reps)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_stream(f2, inputs, reps)
        t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (k2 - k1) / reps)
    return best
