"""Memory tracking — the MemoryTrackerThread analogue (src/main.cpp:453;
upcxx-utils MemoryTrackerThread).

Samples process RSS on a background thread; produces the "Peak memory" figure
the summary CSV records (src/main.cpp:340-392) plus LOG_MEM waypoints.
"""

from __future__ import annotations

import threading
import time

from .logging import log


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024**2
    except OSError:
        pass
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2
    except Exception:
        return 0.0


class MemoryTracker:
    def __init__(self, interval_s: float = 1.0):
        self.interval_s = interval_s
        self.peak_gb = 0.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            self.peak_gb = max(self.peak_gb, _rss_gb())
            self._stop.wait(self.interval_s)

    def stop(self) -> float:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        self.peak_gb = max(self.peak_gb, _rss_gb())
        return self.peak_gb


def log_mem(tag: str):
    """LOG_MEM waypoint (src/main.cpp:199-258)."""
    log(f"Memory at {tag}: {_rss_gb():.2f} GB RSS", verbose_only=True)


def free_mem_gb() -> float:
    """Available host memory (the get_free_mem analogue, upcxx_utils)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable"):
                    return int(line.split()[1]) / 1024**2
    except OSError:
        pass
    return 0.0


def check_input_size(total_input_bytes: int, factor: float = 3.0) -> str | None:
    """The 3x-input free-memory sanity check (src/main.cpp:153-156): the
    pipeline holds reads + packed cache + table, roughly 3x the input size.
    Returns a warning string when the envelope does not fit, else None."""
    free_gb = free_mem_gb()
    need_gb = factor * total_input_bytes / 1024**3
    if free_gb and need_gb > free_gb:
        return (
            f"Insufficient memory: estimated need {need_gb:.2f} GB "
            f"({factor:.0f}x input) vs {free_gb:.2f} GB available — "
            "the run may OOM; consider --subsample-pct or more hosts"
        )
    return None
