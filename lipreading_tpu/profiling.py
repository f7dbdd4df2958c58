"""Tracing / profiling (SURVEY.md §6: "jax.profiler trace annotations around
ingest/preprocess/step, Perfetto-compatible dumps; the BASELINE metric is
computed by a built-in benchmark harness, not eyeballed").

The reference has nothing beyond TensorBoard curves; here:

* ``annotate(name)`` — zero-cost-when-idle trace annotation context that
  shows up in the XLA/TPU trace viewer;
* ``capture(dir)`` — context manager around jax.profiler.start_trace /
  stop_trace writing a Perfetto/TensorBoard-compatible trace;
* ``Timer`` — steady-state wall-clock timing with block_until_ready
  semantics (what bench.py uses).
"""

from __future__ import annotations

import contextlib
import time

import jax


def annotate(name: str):
    """Named region visible in the device trace (nestable)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def capture(log_dir: str):
    """Capture a device trace into ``log_dir`` (view with TensorBoard's
    profile plugin or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Steady-state throughput measurement for jitted callables."""

    def __init__(self, fn, warmup: int = 2):
        self.fn = fn
        self.warmup = warmup

    def measure(self, *args, reps: int = 10) -> float:
        """Returns seconds per call (post-warmup, device-synchronized)."""
        out = None
        for _ in range(self.warmup):
            out = self.fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = self.fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps


def device_memory_stats() -> dict:
    """Per-device HBM usage (bytes) where the backend reports it."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                stats[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:
            pass
    return stats
