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


_DTYPE_BYTES = {
    "pred": 1, "u8": 1, "s8": 1,
    "u16": 2, "s16": 2, "f16": 2, "bf16": 2,
    "u32": 4, "s32": 4, "f32": 4,
    "u64": 8, "s64": 8, "f64": 8, "c64": 8,
}

_COLLECTIVES = (
    "all-to-all", "all-gather", "all-reduce", "reduce-scatter",
    "collective-permute",
)


def hlo_collective_bytes(hlo_text: str) -> dict:
    """Per-collective (static instance count, output bytes) parsed from a
    compiled module's HLO text — the measured cross-check for the formula
    accounting above (a regression that changes the exchange shape shows up
    here even if the bookkeeping formula is stale).

    Bytes are PER DEVICE and PER STATIC INSTANCE: a collective inside a
    while-loop body is one instance regardless of the dynamic trip count
    (spill rounds multiply the real traffic), and async pairs
    (all-to-all-start/-done) count once via the -start op.
    """
    import re

    out: dict = {}
    # e.g.  %a2a = u32[8,3,1024]{2,1,0} all-to-all(...)
    #       %t = (u32[1,3,256]{2,1,0}, ..., /*index=5*/u32[1,3,256]{2,1,0},
    #             ...) all-to-all(...)   <- tuple results carry /*index=N*/
    pat = re.compile(
        r"=\s*(.+?)\s+(" + "|".join(_COLLECTIVES) + r")(-start)?\("
    )
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m is None:
            continue
        shapes, op, _ = m.groups()
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            if dt not in _DTYPE_BYTES:
                continue
            numel = 1
            for d in dims.split(","):
                if d:
                    numel *= int(d)
            nbytes += numel * _DTYPE_BYTES[dt]
        calls, tot = out.get(op, (0, 0))
        out[op] = (calls + 1, tot + nbytes)
    return out


def hlo_report(hlo_text: str, label: str = "") -> str:
    per = hlo_collective_bytes(hlo_text)
    lines = [f"    collectives in compiled HLO{' (' + label + ')' if label else ''} "
             "(static instances, per-device bytes/instance):"]
    if not per:
        lines.append("      (none)")
    for op, (calls, nbytes) in sorted(per.items()):
        lines.append(f"      {op:20s} x{calls}  {_sz(nbytes)}")
    return "\n".join(lines)


def _sz(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if n < 1024:
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n:.1f}PB"


comm_stats = CommStats()
