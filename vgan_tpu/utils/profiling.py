"""Stage timing + throughput counters.

The reference has no tracing (SURVEY.md §5 — only progress bars); the
new framework makes per-stage wall time and reads/s first-class. Wrap
pipeline stages in `stage(...)` and print a summary, or use
`jax_trace(...)` to capture a JAX profiler trace for xprof.
"""
from __future__ import annotations

import contextlib
import sys
import time
from dataclasses import dataclass, field
from typing import Dict


@dataclass
class StageStats:
    name: str
    seconds: float = 0.0
    items: int = 0
    calls: int = 0

    @property
    def per_s(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


@dataclass
class Profiler:
    enabled: bool = True
    stages: Dict[str, StageStats] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            st = self.stages.setdefault(name, StageStats(name))
            st.seconds += dt
            st.items += items
            st.calls += 1

    def report(self, file=sys.stderr) -> None:
        if not self.stages:
            return
        total = sum(s.seconds for s in self.stages.values())
        print("── stage timing ──", file=file)
        for s in self.stages.values():
            rate = f"  {s.per_s:,.0f}/s" if s.items else ""
            print(
                f"  {s.name:<24} {s.seconds:8.2f}s "
                f"({100 * s.seconds / total:5.1f}%){rate}",
                file=file,
            )
        print(f"  {'total':<24} {total:8.2f}s", file=file)


PROFILER = Profiler(enabled=False)


def enable() -> Profiler:
    PROFILER.enabled = True
    return PROFILER


@contextlib.contextmanager
def jax_trace(logdir: str):
    """Capture a JAX profiler trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
