"""Profiling & tracing utilities.

The reference's only instrumentation is wall-clock prints
(`image_generator.py:119,196-198` in manuragkhullar/ConceptAttention). Here
profiling is a first-class subsystem: JAX/XLA trace capture (viewable in
Perfetto/TensorBoard), per-phase wall timers, and a compiled-FLOPs/bytes cost
readout from XLA's analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace (Perfetto/TensorBoard viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named wall-clock phases with block_until_ready fencing."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.3f}s ({100 * v / max(total, 1e-9):.1f}%)" for k, v in self.times.items()]
        return "\n".join(lines)


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, Optional[float]]:
    """FLOPs / bytes-accessed estimate from XLA's cost analysis of the
    compiled executable (no execution)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    return {
        "flops": analysis.get("flops"),
        "bytes_accessed": analysis.get("bytes accessed"),
    }
