"""Profiling — first-class tracing the reference never had (SURVEY §5):
jax.profiler traces viewable in TensorBoard/Perfetto + named step
annotations."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lora_tpu_trace") -> Iterator[None]:
    """Capture a device trace: `with trace("/tmp/t"): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(label: str, sync=None) -> Iterator[None]:
    """Host-side wall timing with optional device sync on exit."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    print(f"[timing] {label}: {(time.perf_counter() - t0) * 1000:.2f} ms")


def memory_stats(device: Optional[jax.Device] = None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return stats or {}
