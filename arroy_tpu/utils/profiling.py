"""Device-side profiling hooks.

The reference traces build milestones with the `tracing` crate
(reference: src/writer.rs:515,609,...); the TPU equivalent for kernel
time is the JAX profiler.  `trace(dir)` wraps any region (build, query
loop) and writes a TensorBoard/XProf trace.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=print):
    """Host wall-clock timing of a region (the `Instant` role)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {time.perf_counter() - t0:.3f}s")
