"""Per-stage communication accounting — the GASNet-stats analogue.

The reference wraps stages with begin/end_gasnet_stats and reduces per-rank
GASNet counters (gets/puts/AM counts+bytes, src/gasnet_stats.cpp:79-189).
With XLA collectives the byte counts are statically known per step, so the
accounting is exact bookkeeping: each stage records host->device bytes and
collective (all_to_all / reduction) bytes, reported with the reference's
min/avg/max-balance convention.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageComm:
    h2d_bytes: int = 0
    d2h_bytes: int = 0
    collective_bytes: int = 0
    collective_calls: int = 0


class CommStats:
    def __init__(self):
        self.stages = defaultdict(StageComm)
        self._current = None

    def begin_stage(self, name: str):
        self._current = name

    def end_stage(self):
        self._current = None

    def _rec(self) -> StageComm:
        return self.stages[self._current or "(outside stages)"]

    def add_h2d(self, nbytes: int):
        self._rec().h2d_bytes += nbytes

    def add_d2h(self, nbytes: int):
        self._rec().d2h_bytes += nbytes

    def add_collective(self, nbytes: int, calls: int = 1):
        s = self._rec()
        s.collective_bytes += nbytes
        s.collective_calls += calls

    def totals(self) -> dict:
        """Whole-run totals per metric (for cross-process balance lines)."""
        t = StageComm()
        for s in self.stages.values():
            t.h2d_bytes += s.h2d_bytes
            t.d2h_bytes += s.d2h_bytes
            t.collective_bytes += s.collective_bytes
            t.collective_calls += s.collective_calls
        return {
            "h2d_bytes": t.h2d_bytes,
            "d2h_bytes": t.d2h_bytes,
            "collective_bytes": t.collective_bytes,
            "collective_calls": t.collective_calls,
        }

    def report(self) -> str:
        lines = ["    communication per stage (this process):"]
        for name, s in self.stages.items():
            lines.append(
                f"      {name:24s} h2d {_sz(s.h2d_bytes)}  d2h {_sz(s.d2h_bytes)}  "
                f"collectives {s.collective_calls} calls {_sz(s.collective_bytes)}"
            )
        return "\n".join(lines)


def _sz(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if n < 1024:
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n:.1f}PB"


comm_stats = CommStats()
