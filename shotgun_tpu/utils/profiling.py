"""Per-phase wall-clock / throughput counters and optional jax profiler.

The reference has no tracing at all (SURVEY.md §5.1); this is the
new-build observability layer: a process-global registry of phase timers
(parse, pack, build, table, probe, classify, summarize) surfaced by the
CLI's ``--profile`` flag, plus an optional XLA trace dump via
``jax.profiler`` when ``SHOTGUN_TPU_TRACE_DIR`` is set.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class PhaseStat:
    seconds: float = 0.0
    calls: int = 0
    items: int = 0  # unit count (reads, bases, ...), caller-defined


class Profiler:
    def __init__(self) -> None:
        self.enabled = False
        self.stats: "OrderedDict[str, PhaseStat]" = OrderedDict()

    def enable(self) -> None:
        self.enabled = True

    @contextlib.contextmanager
    def phase(self, name: str, items: int = 0) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            st = self.stats.setdefault(name, PhaseStat())
            st.seconds += dt
            st.calls += 1
            st.items += items

    def report(self, stream=None) -> None:
        if not self.enabled or not self.stats:
            return
        stream = stream or sys.stderr
        print("=== profile ===", file=stream)
        for name, st in self.stats.items():
            rate = ""
            if st.items and st.seconds > 0:
                rate = f"  {st.items / st.seconds:,.0f}/s"
            print(
                f"{name:20s} {st.seconds * 1e3:10.1f} ms  x{st.calls}{rate}",
                file=stream,
            )


#: process-global profiler used by the CLI
PROFILER = Profiler()
phase = PROFILER.phase


@contextlib.contextmanager
def maybe_trace() -> Iterator[None]:
    """Wrap a region in a jax profiler trace if SHOTGUN_TPU_TRACE_DIR is
    set (view with TensorBoard / xprof)."""
    trace_dir = os.environ.get("SHOTGUN_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
