"""Process-aware logging (the upcxx-utils SLOG/SLOG_VERBOSE analogue).

Rank-0 (process 0) writes to stdout and every process appends to a per-process
log file under ``per_rank/`` with a rank-0 hardlink at the output root, like
init_logger at src/options.cpp:448-458.
"""

from __future__ import annotations

import os
import sys
import time

_VERBOSE = False
_LOG_FILE = None
_T0 = time.time()


def is_rank0() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def init_logger(output_dir: str, verbose: bool = False, rank: int | None = None):
    global _VERBOSE, _LOG_FILE
    _VERBOSE = verbose
    if rank is None:
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0
    per_rank = os.path.join(output_dir, "per_rank")
    os.makedirs(per_rank, exist_ok=True)
    path = os.path.join(per_rank, f"mhm2.log.{rank}" if rank else "mhm2.log")
    _LOG_FILE = open(path, "a")
    if rank == 0:
        link = os.path.join(output_dir, "mhm2.log")
        if not os.path.exists(link):
            try:
                os.link(path, link)
            except OSError:
                pass


def log(*parts, verbose_only: bool = False):
    msg = "".join(str(p) for p in parts)
    line = f"{time.time() - _T0:10.3f} {msg}"
    if _LOG_FILE:
        _LOG_FILE.write(line + "\n")
        _LOG_FILE.flush()
    if is_rank0() and (not verbose_only or _VERBOSE):
        print(msg, file=sys.stderr)


def slog(*parts):
    log(*parts)


def slog_verbose(*parts):
    log(*parts, verbose_only=True)
