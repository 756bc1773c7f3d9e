"""Profiling / tracing utilities.

Reference surface: `torch.profiler.record_function` scopes around the top-k
phases (`/root/reference/rails/indexing/mol_top_k.py:23,350-371`) and the
hand-rolled latency harness (`data/eval.py:140-170`). TPU-native equivalents:
`jax.named_scope` annotations (already on the retrieval phases) plus the
`jax.profiler` trace context below, and `block_until_ready`-bracketed wall
timing with explicit warmup.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto.

    May be unavailable on experimental backends; degrades to a no-op.
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def benchmark(
    fn: Callable,
    inputs: Sequence,
    warmup: int = 3,
    repeats: int = 3,
    fetch: Optional[Callable] = None,
) -> dict:
    """Throughput-benchmark fn over DISTINCT inputs, host-fetching every
    result (see memory note: remote backends can dedupe identical calls and
    under-report completion). Returns per-call stats in ms."""
    fetch = fetch or (lambda r: np.asarray(jax.tree_util.tree_leaves(r)[0]))
    for i in range(warmup):
        fetch(fn(inputs[i % len(inputs)]))
    times: List[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(x) for x in inputs]
        for o in outs:
            fetch(o)
        times.append((time.perf_counter() - t0) / len(inputs))
    arr = np.asarray(times) * 1e3
    return {
        "best_ms": float(arr.min()),
        "mean_ms": float(arr.mean()),
        "std_ms": float(arr.std()),
        "num_inputs": len(inputs),
        "repeats": repeats,
    }
