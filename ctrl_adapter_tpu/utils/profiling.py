"""Tracing / profiling utilities — the observability layer the reference lacks.

The reference measures only coarse per-step wall-clock (`train.py:1451,1469`,
SURVEY §5 "no torch profiler, no NVTX"). Here:
- ``trace`` context manager captures a jax.profiler trace (XLA ops, TPU timelines,
  viewable in TensorBoard / Perfetto);
- ``StepTimer`` gives p50/p95 step latencies with device sync;
- ``annotate`` adds named TraceAnnotations visible in the profile.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace("/tmp/profile"): run_step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


class StepTimer:
    """Wall-clock step statistics with blocking sync (per-step ``loss_time``
    equivalent of `train.py:1451,1469`, plus percentiles)."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def block_and_stop(self, result):
        jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)
        return result

    def stats(self) -> Dict[str, float]:
        arr = np.asarray(self.times)
        if arr.size == 0:
            return {}
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "min_s": float(arr.min()),
            "steps": int(arr.size),
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage (bytes) where the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
        except Exception:
            pass
    return out
