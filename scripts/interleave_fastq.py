#!/usr/bin/env python3
"""Pair interleaver — the contrib/interleave_fastq.c equivalent (gzip-aware)."""

import gzip
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`


def _open(p):
    return gzip.open(p, "rt") if p.endswith(".gz") else open(p)


def main():
    if len(sys.argv) != 3:
        print("usage: interleave_fastq.py r1.fastq[.gz] r2.fastq[.gz] > out.fastq",
              file=sys.stderr)
        return 1
    with _open(sys.argv[1]) as f1, _open(sys.argv[2]) as f2:
        while True:
            r1 = [f1.readline() for _ in range(4)]
            r2 = [f2.readline() for _ in range(4)]
            if not r1[0] or not r2[0]:
                if r1[0] or r2[0]:
                    print("warning: unequal record counts", file=sys.stderr)
                break
            sys.stdout.write("".join(r1))
            sys.stdout.write("".join(r2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
