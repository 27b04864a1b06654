"""Profiling hooks: jax.profiler traces + a simple phase timer.

SURVEY.md §5: the reference has no tracer — its closest artifact is the
inverse-RTF monitor. Here jax profiler traces are first-class: wrap any code
in ``trace(dir)`` and load the result in TensorBoard/XProf, or use
``PhaseTimer`` for cheap wall-clock phase accounting in the streaming loop.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rtwa_trace"):
    import jax.profiler

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure_sync_floor(n: int = 12) -> float:
    """Median ms of a minimal device sync round-trip.

    On a tunneled backend (axon relay) every ``block_until_ready`` /
    device→host read pays a fixed ~30 ms latency that has nothing to do with
    the op being measured; on direct-attached TPUs it is ~0.1 ms. Phase
    breakdowns that block at phase boundaries (asr.TPUWhisperASR.phase_timer)
    overstate every phase by this floor — bench.py measures it once and
    reports floor-corrected numbers alongside the raw ones.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(jnp.zeros((8,), jnp.float32))
    f = jax.jit(lambda v: v + 1.0)
    np.asarray(f(x))  # compile + first-transfer outside the measurement
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1e3 * times[len(times) // 2]


class PhaseTimer:
    """Accumulates wall time per named phase; negligible overhead."""

    def __init__(self, clock=time.perf_counter):
        self.clock = clock
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = self.clock()
        try:
            yield
        finally:
            self.totals[name] += self.clock() - t0
            self.counts[name] += 1

    # lap-style API for instrumenting straight-line pipelines (asr.py hot path)
    def mark(self) -> None:
        self._t = self.clock()

    def lap(self, name: str) -> None:
        now = self.clock()
        self.totals[name] += now - getattr(self, "_t", now)
        self.counts[name] += 1
        self._t = now

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in sorted(self.totals)
        }
