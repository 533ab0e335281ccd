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


class AdvancedProfiler(SimpleProfiler):
    """Per-action cProfile aggregation (reference AdvancedProfiler,
    ``src/utils/profiler.py:196-254``): every ``record(name)`` region runs
    under its own ``cProfile.Profile``, and :meth:`summary` appends the
    top host-side functions per action to the wall-time table."""

    def __init__(self, top_n: int = 10):
        super().__init__()
        import cProfile

        self._cProfile = cProfile
        self.top_n = top_n
        self.profilers: Dict[str, "cProfile.Profile"] = {}

    @contextlib.contextmanager
    def record(self, name: str) -> Iterator[None]:
        prof = self.profilers.get(name)
        if prof is None:
            prof = self.profilers[name] = self._cProfile.Profile()
        prof.enable()
        try:
            with super().record(name):
                yield
        finally:
            prof.disable()

    def summary(self) -> str:
        import io
        import pstats

        out = [super().summary()]
        for name, prof in self.profilers.items():
            buf = io.StringIO()
            stats = pstats.Stats(prof, stream=buf)
            stats.strip_dirs().sort_stats("cumulative").print_stats(self.top_n)
            out.append(f"\n--- {name} (top {self.top_n} by cumulative) ---")
            out.append(buf.getvalue().rstrip())
        return "\n".join(out)

    def dump(self, path_prefix: str) -> None:
        """Write one .pstats file per action (loadable with pstats/snakeviz)."""
        for name, prof in self.profilers.items():
            safe = name.replace("/", "_").replace(" ", "_")
            prof.dump_stats(f"{path_prefix}.{safe}.pstats")


class ChromeTraceProfiler(SimpleProfiler):
    """Records every action occurrence as a Catapult/Perfetto event
    (``chrome://tracing`` JSON) — the host-side analogue of the reference's
    PyTorch chrome-trace export (``src/utils/profiler.py:256-542``); device
    work is covered by :func:`trace` (jax.profiler)."""

    def __init__(self):
        super().__init__()
        self.events = []

    @contextlib.contextmanager
    def record(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            with super().record(name):
                yield
        finally:
            self.events.append(
                {
                    "name": name,
                    "ph": "X",
                    "ts": t0 * 1e6,
                    "dur": (time.perf_counter() - t0) * 1e6,
                    "pid": 0,
                    "tid": 0,
                }
            )

    def export_chrome_trace(self, path: str) -> None:
        import json as _json
        import os as _os

        _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            _json.dump({"traceEvents": self.events}, f)


def build_profiler(name: Optional[str]) -> PassThroughProfiler:
    """Registry mirroring the reference ``build_profiler`` names."""
    if name in (None, "none", "pass_through"):
        return PassThroughProfiler()
    if name in ("inference", "simple"):
        return SimpleProfiler()
    if name == "advanced":
        return AdvancedProfiler()
    if name in ("chrome", "pytorch"):
        # "pytorch" is the reference registry name for its chrome-trace
        # profiler; host-side equivalent here
        return ChromeTraceProfiler()
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
