#!/usr/bin/env python3
"""Run-log report generator — the mhm2_parse_run_log.pl equivalent.

Parses mhm2.log for stage timings and the machine-readable contract lines
(tot_num_reads / Total kmers / Total kmer count sum / Peak memory,
src/main.cpp:340-392) and prints a summary report.
"""

import re
import sys


def parse(path: str) -> dict:
    out = {"stages": {}, "metrics": {}}
    stage_re = re.compile(r"^\s*(\w[\w_]*)\s+([\d.]+) s \(\s*([\d.]+) %\)")
    metric_res = {
        "tot_num_reads": re.compile(r"tot_num_reads: (\d+)"),
        "unique_kmers": re.compile(r"Total kmers: (\d+)"),
        "total_kmer_count_sum": re.compile(r"Total kmer count sum: (\d+)"),
        "peak_memory_gb": re.compile(r"Peak memory: ([\d.]+) GB"),
    }
    with open(path) as f:
        for line in f:
            mm = stage_re.search(line)
            if mm:
                out["stages"][mm.group(1)] = float(mm.group(2))
            for name, rr in metric_res.items():
                mm = rr.search(line)
                if mm:
                    out["metrics"][name] = float(mm.group(1))
    return out


def main():
    if len(sys.argv) != 2:
        print("usage: parse_run_log.py <mhm2.log>", file=sys.stderr)
        return 1
    rep = parse(sys.argv[1])
    print("== stage timings ==")
    for stage, secs in sorted(rep["stages"].items(), key=lambda p: -p[1]):
        print(f"  {stage:28s} {secs:10.2f} s")
    print("== metrics ==")
    for name, val in rep["metrics"].items():
        print(f"  {name:28s} {val}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
