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


class _PhaseHandle:
    """Yielded by PhaseTimer.phase; register arrays PRODUCED INSIDE the block
    so the phase's device work is billed to it: `ph.fence(latents)`."""

    def __init__(self, fences):
        self._fences = fences

    def fence(self, *arrays):
        self._fences.extend(arrays)


class PhaseTimer:
    """Named wall-clock phases with block_until_ready fencing.

    `fence=` (evaluated at entry) fences a pre-existing array; for arrays
    created inside the block, call `.fence(arr)` on the yielded handle —
    without either, a phase wrapping async dispatches records only dispatch
    time, and a stale `fence=` array would bill a PREVIOUS phase's device
    work to this one:

        with timer.phase("denoise") as ph:
            latents = run(...)
            ph.fence(latents)
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence: Any = None):
        fences = [] if fence is None else [fence]
        t0 = time.perf_counter()
        try:
            yield _PhaseHandle(fences)
        finally:
            for f in fences:
                jax.block_until_ready(f)
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


def loop_rate(
    fn: Callable,
    *args,
    iters: int = 6,
    perturb: Optional[Callable] = None,
) -> float:
    """Seconds per call of `fn(*args)`, measured as ONE jitted
    `lax.fori_loop` of `iters` calls with a host-fetched f32 checksum.

    This is the measurement primitive that stays valid on backends where
    per-dispatch overhead dominates (30-90 ms per dispatch through the axon
    TPU tunnel) and `block_until_ready` does not synchronize device compute
    (only a host fetch does) — separately-dispatched timing loops measure
    dispatch there, not compute. bench.py's phase split is built on this
    technique.

    `perturb(i, args) -> args` must make iterations non-foldable; the
    default scales the first array argument by (1 + i/64), whose steps are
    exactly representable in bfloat16 (1 + 1e-6-style epsilons round away
    at bf16's 2^-7 spacing, letting XLA fold all iterations into one).
    """
    import jax.numpy as jnp

    if perturb is None:
        def perturb(i, a):
            scale = (1.0 + i.astype(jnp.float32) / 64.0).astype(a[0].dtype)
            return (a[0] * scale, *a[1:])

    def checksum(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + checksum(fn(*perturb(i, a)))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))  # deferred fetch at the end: true device sync
    return (time.perf_counter() - t0) / iters
