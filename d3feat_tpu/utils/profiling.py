"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock tic/toc pairs split into
data vs. model time (reference: trainer.py:71-135, utils/timer.py). Here the
same split is kept in the trainer meters, plus first-class XLA tooling:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (device timeline, HLO ops, memory viewer);
* :func:`annotate` — named host-side region that shows up in the trace;
* :class:`SectionTimer` — blocking wall-clock section stats for quick
  breakdowns without a trace viewer (forces ``block_until_ready``).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device+host profile into ``logdir`` (view in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region context (nests inside :func:`trace` output)."""
    return jax.profiler.TraceAnnotation(name)


class SectionTimer:
    """Accumulating per-section wall timer that syncs the device.

    >>> st = SectionTimer()
    >>> with st.section("pyramid"):
    ...     out = build_pyramid(...)
    >>> st.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t*1e3:.1f} ms total, "
                         f"{t/c*1e3:.2f} ms/call x{c}")
        return "\n".join(lines)
