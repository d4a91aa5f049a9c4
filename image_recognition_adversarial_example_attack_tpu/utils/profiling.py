"""Tracing & throughput instrumentation (SURVEY.md §5: the reference has
none — no timers, no profiler anywhere; this is the TPU-native subsystem).

Two layers:
- ``jax.profiler`` traces behind every CLI's ``--profile-dir`` flag
  (cli/common.py ``maybe_profile``) — open the trace in XProf/TensorBoard;
- ``PhaseTimer`` — lightweight wall-clock + examples/sec counters for
  experiment phases, printed and/or collected as a dict for JSON reports.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class PhaseRecord:
    name: str
    seconds: float
    examples: int | None = None

    @property
    def examples_per_sec(self) -> float | None:
        if self.examples is None or self.seconds <= 0:
            return None
        return self.examples / self.seconds


@dataclass
class PhaseTimer:
    """Collects named phase timings; device work must be blocked on by the
    caller before the phase exits (jax is async)."""

    verbose: bool = False
    records: list[PhaseRecord] = field(default_factory=list)

    @contextmanager
    def phase(self, name: str, examples: int | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            rec = PhaseRecord(name=name, seconds=time.perf_counter() - t0,
                              examples=examples)
            self.records.append(rec)
            if self.verbose:
                rate = f" ({rec.examples_per_sec:.1f} ex/s)" if rec.examples_per_sec else ""
                print(f"[phase] {name}: {rec.seconds:.2f}s{rate}")

    def as_dict(self) -> dict:
        return {
            r.name: {
                "seconds": round(r.seconds, 4),
                **({"examples": r.examples,
                    "examples_per_sec": round(r.examples_per_sec, 2)}
                   if r.examples is not None else {}),
            }
            for r in self.records
        }


@contextmanager
def device_timer():
    """Times a block including a final device sync. Usage:
    ``with device_timer() as t: out = fn(x); jax.block_until_ready(out)``
    then ``t()`` returns the elapsed seconds."""
    t0 = time.perf_counter()
    yield lambda: time.perf_counter() - t0
