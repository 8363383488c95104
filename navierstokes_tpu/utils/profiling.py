"""Profiling / tracing hooks.

The reference instruments with `PetscLogEventRegister/Begin/End` +
`PetscLogFlops` so `-log_view` reports per-event times and flop rates
(`src/solve.c:240-292`, `src/kernels/baij4_avx2.c:82`), plus raw
`clock_gettime`/`chrono` wall timing.  Equivalents here:

- `EventLog`: named-event wall timing with optional flop accounting and a
  `-log_view`-style report table.  Device-aware: `sync=True` blocks on a
  result so an event brackets real device work, not dispatch.
- `trace()`: context manager around `jax.profiler` for full XLA traces
  (TensorBoard-compatible), the deep-inspection path.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional


class EventLog:
    def __init__(self):
        self._count = defaultdict(int)
        self._total = defaultdict(float)
        self._flops = defaultdict(float)

    @contextlib.contextmanager
    def event(self, name: str, flops: float = 0.0, sync_result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_result is not None:
                import jax

                jax.block_until_ready(sync_result)
            self._count[name] += 1
            self._total[name] += time.perf_counter() - t0
            self._flops[name] += flops

    def log_flops(self, name: str, flops: float):
        self._flops[name] += flops

    def report(self) -> str:
        """`-log_view`-style summary table."""
        lines = [
            f"{'Event':<28}{'Count':>8}{'Time (s)':>12}{'Avg (ms)':>12}"
            f"{'GFLOP/s':>10}"
        ]
        for name in sorted(self._total, key=lambda n: -self._total[n]):
            cnt, tot = self._count[name], self._total[name]
            gfs = self._flops[name] / tot / 1e9 if tot > 0 else 0.0
            lines.append(
                f"{name:<28}{cnt:>8}{tot:>12.4f}{1e3 * tot / max(cnt, 1):>12.3f}"
                f"{gfs:>10.2f}"
            )
        return "\n".join(lines)

    def totals(self):
        return dict(self._total)


event_log = EventLog()


@contextlib.contextmanager
def trace(logdir: str):
    """Full XLA profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
