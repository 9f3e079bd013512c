"""Tracing / profiling / step-time metrics.

The reference's observability is manual wall-clock timing
(drift_noise_model.py:245,290; testUM.py:141-144) plus tqdm strings
(SURVEY.md SS5.1). The TPU build upgrades this to:

  * ``StepTimer`` — wall-clock step statistics with warmup discard
    (compile-aware), the structured analogue of the reference's
    ``iter_time`` accounting,
  * ``trace()`` — a context manager around ``jax.profiler`` emitting an XLA
    trace viewable in XProf/TensorBoard,
  * ``annotate()`` — ``jax.profiler.TraceAnnotation`` wrapper for labelling
    host-side phases inside a trace,
  * ``device_memory_stats()`` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


class StepTimer:
    """Accumulates per-step wall-clock times; first ``warmup`` steps (jit
    compiles) are tracked separately."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self.warmup_times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if len(self.warmup_times) < self.warmup:
            self.warmup_times.append(dt)
        else:
            self.times.append(dt)
        return False

    def summary(self) -> Dict[str, float]:
        arr = np.asarray(self.times) if self.times else np.asarray([0.0])
        return {
            "steps": len(self.times),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "min_s": float(arr.min()),
            "warmup_s": float(sum(self.warmup_times)),
        }

    def message(self) -> str:
        s = self.summary()
        return (f"steps={s['steps']} mean={s['mean_s']*1000:.1f}ms "
                f"p50={s['p50_s']*1000:.1f}ms p95={s['p95_s']*1000:.1f}ms "
                f"(warmup {s['warmup_s']:.1f}s)")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA/host profile into ``log_dir`` (open with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side phase inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory snapshot (bytes); empty dict where unsupported."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {
                    "bytes_in_use": int(stats.get("bytes_in_use", 0)),
                    "peak_bytes_in_use": int(stats.get("peak_bytes_in_use", 0)),
                    "bytes_limit": int(stats.get("bytes_limit", 0)),
                }
        except Exception:
            continue
    return out
