"""Stage timers: the upcxx-utils BarrierTimer/IntermittentTimer analogue.

The reference reports per-stage min/my/avg/max with balance across ranks
(src/stage_timers.hpp:53-75, src/main.cpp:273-287,439); in a single-controller
JAX job the cross-host reduction happens via multihost utils when distributed,
else locally.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class IntermittentTimer:
    name: str
    elapsed: float = 0.0
    count: int = 0
    _start: float = field(default=0.0, repr=False)

    def start(self):
        self._start = time.perf_counter()

    def stop(self):
        self.elapsed += time.perf_counter() - self._start
        self.count += 1

    @contextmanager
    def timeit(self):
        self.start()
        try:
            yield
        finally:
            self.stop()


class StageTimers:
    """Fixed stage list mirroring stage_timers.hpp:53-75 (incl. the stages the
    proxy keeps for the future assembly phases)."""

    STAGES = [
        "merge_reads",
        "cache_reads",
        "load_ctgs",
        "analyze_kmers",
        "kernel_kmer_analysis",
        "dbjg_traversal",
        "alignments",
        "localassm",
        "cgraph",
        "dump_ctgs",
        "compute_kmer_depths",
    ]

    def __init__(self):
        for s in self.STAGES:
            setattr(self, s, IntermittentTimer(s))

    def report(self, total_elapsed: float) -> str:
        lines = ["    stage timing:"]
        for s in self.STAGES:
            t = getattr(self, s)
            if t.elapsed > 0:
                pct = 100.0 * t.elapsed / total_elapsed if total_elapsed else 0
                lines.append(f"      {s:24s} {t.elapsed:10.2f} s ({pct:5.1f} %)")
        return "\n".join(lines)


stage_timers = StageTimers()
