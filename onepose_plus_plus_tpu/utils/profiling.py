"""Profiling & tracing utilities (TPU-native).

Replaces the reference's vendored PL profilers (``src/utils/profiler.py``,
542 LoC: PassThrough/Simple/Advanced(cProfile)/PyTorch autograd+NVTX) with
the JAX equivalents (SURVEY.md §5):

  * :class:`SimpleProfiler` — wall-time accounting per named action with a
    summary table (drop-in for the reference SimpleProfiler usage);
  * :class:`PassThroughProfiler` — no-op with the same interface;
  * :func:`trace` — ``jax.profiler`` device trace to a Perfetto/TensorBoard
    directory (the NVTX/chrome-trace replacement);
  * :func:`annotate` — ``jax.named_scope`` + ``jax.profiler.TraceAnnotation``
    so hot-path sections show up in device traces (replaces
    ``profiler.record_function`` hooks in the matcher).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PassThroughProfiler:
    """No-op profiler with the record interface."""

    @contextlib.contextmanager
    def record(self, name: str) -> Iterator[None]:
        yield

    def summary(self) -> str:
        return ""


class SimpleProfiler(PassThroughProfiler):
    """Wall-time per action (mirrors reference SimpleProfiler semantics:
    cumulative duration + call count, pretty summary)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def record(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return "(no profiled actions)"
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        width = max(len(k) for k, _ in rows)
        lines = [f"{'Action':<{width}} |   Total (s) | Calls |  Mean (ms)"]
        for k, total in rows:
            n = self.counts[k]
            lines.append(
                f"{k:<{width}} | {total:11.3f} | {n:5d} | {total / n * 1e3:9.2f}"
            )
        return "\n".join(lines)


def build_profiler(name: Optional[str]) -> PassThroughProfiler:
    """Registry mirroring the reference ``build_profiler`` names."""
    if name in (None, "none", "pass_through"):
        return PassThroughProfiler()
    if name in ("inference", "simple"):
        return SimpleProfiler()
    raise ValueError(f"unknown profiler {name!r}")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named scope visible in both HLO and device traces."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield
