#!/usr/bin/env python3
"""Proxy launcher — the run_app.py equivalent (reference run_app.py:16-91).

Splits launcher args (-n devices) from app args, runs the pipeline with the
bundled adapters, then scrapes the log for the k-mer count and timing like
the reference's post-run scrape (run_app.py:68-84).
"""

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-n", "--devices", type=int, default=0, help="device count (0=all)")
    p.add_argument("-p", "--paired", nargs=2, metavar=("R1", "R2"), default=None)
    p.add_argument("-r", "--reads", nargs="+", default=[])
    p.add_argument("-o", "--output", default="")
    p.add_argument("extra", nargs="*", help="extra app args")
    a = p.parse_args()

    out = a.output or "proxy-run-" + time.strftime("%y%m%d%H%M%S")
    cmd = [sys.executable, "-m", "mhm2_kmer_analysis_v2_tpu.pipeline.main", "-o", out, "-v"]
    if a.paired:
        cmd += ["-p"] + a.paired
    if a.reads:
        cmd += ["-r"] + a.reads
    if a.devices:
        cmd += ["--n-devices", str(a.devices)]
    adapters = os.path.join(REPO, "data", "all_adapters.fa")
    if os.path.exists(adapters):
        cmd += ["--adapter-refs", adapters]
    cmd += a.extra

    t0 = time.time()
    env = dict(os.environ, PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    rc = subprocess.call(cmd, env=env)
    elapsed = time.time() - t0
    if rc != 0:
        print(f"run failed with exit code {rc}", file=sys.stderr)
        return rc

    # post-run log scrape (reference run_app.py:68-84)
    log_path = os.path.join(out, "mhm2.log")
    kmers = None
    if os.path.exists(log_path):
        for line in open(log_path):
            mm = re.search(r"Total kmers: (\d+)", line)
            if mm:
                kmers = int(mm.group(1))
    print(f"Total kmers: {kmers}")
    print(f"Elapsed: {elapsed:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
