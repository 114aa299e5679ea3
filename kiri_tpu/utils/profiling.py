"""Tracing / profiling utilities.

The reference has no profiling support (SURVEY §5: only ad-hoc timing in its
benchmark). This module adds:

* ``trace(logdir)``      — context manager around ``jax.profiler.trace``;
                           produces TensorBoard-viewable XLA traces.
* ``StageTimer``         — lightweight per-stage wall-clock accounting used
                           by the pipeline's verbose mode.
* ``annotate(name)``     — ``jax.profiler.TraceAnnotation`` wrapper so host
                           stages show up inside device traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/kiri_trace") -> Iterator[None]:
    """Capture an XLA profiler trace (view with TensorBoard's profile tab)."""
    import jax

    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that appears on the host timeline of a device trace."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield


class StageTimer:
    """Accumulates wall-clock per named stage; thread-unsafe by design
    (one per pipeline call)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            with annotate(name):
                yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        total = sum(self.totals.values())
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total else 0.0
            lines.append(f"  {name:24s} {t * 1000:8.1f} ms "
                         f"({pct:4.1f}%)  x{self.counts[name]}")
        lines.append(f"  {'TOTAL':24s} {total * 1000:8.1f} ms")
        return "\n".join(lines)
