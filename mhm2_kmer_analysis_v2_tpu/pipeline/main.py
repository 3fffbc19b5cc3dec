"""CLI entry point (the reference's main.cpp / run_app.py analogue)."""

from __future__ import annotations

import faulthandler
import os
import signal
import sys
import time

from ..config import parse_args
from ..utils.logging import slog
from .analysis import run_pipeline


def main(argv=None):
    t0 = time.time()
    # SIGUSR1 dumps all thread stacks to stderr (post-mortem for wedged
    # XLA:CPU collective rendezvous; no effect otherwise)
    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (AttributeError, ValueError):
        pass
    options = parse_args(argv)
    if not (options.reads_fnames or options.paired_fnames or options.unpaired_fnames):
        print("no reads given: use -r/-p/-u", file=sys.stderr)
        return 1
    for group in options.all_read_groups():
        for f in group:
            if not os.path.exists(f):
                print(f"read file not found: {f}", file=sys.stderr)
                return 1
    try:
        results = run_pipeline(options)
    except ValueError as e:
        # input validation failures (check_is_fastq etc.) exit cleanly like
        # the reference's SDIE path (src/fastq.cpp:173-282)
        print(f"ERROR: {e}", file=sys.stderr)
        return 1
    for r in results:
        slog(
            f"k={r.k}: reads={r.num_reads} unique_kmers={r.unique_kmers} "
            f"total_kmer_count_sum={r.total_kmer_count_sum}"
        )
    slog(f"Finished in {time.time() - t0:.2f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
