#!/usr/bin/env python3
"""Full launcher with auto-resume — the mhm2.py equivalent (src/mhm2.py:523-973).

The reference launcher detects HPC schedulers and spawns upcxx-run; on TPU
the job topology comes from the TPU runtime (jax.distributed reads the
environment), so this wrapper keeps the operationally meaningful parts:
  - environment plumbing (JAX flags, per-run output dirs)
  - stderr capture with signal forensics (src/mhm2.py:903-918)
  - auto-resume: on failure after at least one completed stage, relaunch with
    --restart into the same output dir (src/mhm2.py:925-937)
"""

import argparse
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def count_signals(stderr_text: str) -> dict:
    """Signal forensics over captured stderr (src/mhm2.py:903-918)."""
    found = {}
    for sig in ("SIGBUS", "SIGSEGV", "SIGILL", "SIGKILL", "SIGABRT", "SIGTERM"):
        n = stderr_text.count(sig)
        if n:
            found[sig] = n
    return found


def run_once(app_args, output_dir, restart=False):
    cmd = [sys.executable, "-m", "mhm2_kmer_analysis_v2_tpu.pipeline.main",
           "-o", output_dir] + app_args
    if restart:
        cmd.append("--restart")
    # cwd=REPO (script-dir sys.path) rather than PYTHONPATH: a PYTHONPATH
    # pointing at the repo leaks into the axon compile-helper subprocess
    # (its own pyenv python) and silently breaks TPU plugin registration
    proc = subprocess.Popen(cmd, cwd=REPO, stderr=subprocess.PIPE, text=True)
    stderr_lines = []
    completed_rounds = 0
    for line in proc.stderr:
        sys.stderr.write(line)
        stderr_lines.append(line)
        if "Completed contig round" in line:
            completed_rounds += 1
    proc.wait()
    return proc.returncode, completed_rounds, "".join(stderr_lines)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--auto-resume", action="store_true",
                   help="retry with --restart after failures (forces --checkpoint)")
    p.add_argument("--max-retries", type=int, default=2)
    p.add_argument("-o", "--output", default="")
    a, app_args = p.parse_known_args()

    output_dir = a.output or "mhm2-run-" + time.strftime("%Y%m%d%H%M%S")
    if a.auto_resume and "--dump-merged" not in app_args:
        app_args = app_args + ["--dump-merged"]  # forces the merge checkpoint

    retries = 0
    restart = False
    while True:
        rc, completed, stderr_text = run_once(app_args, output_dir, restart)
        if rc == 0:
            return 0
        sigs = count_signals(stderr_text)
        if sigs:
            print(f"signals observed in stderr: {sigs}", file=sys.stderr)
        if not a.auto_resume or retries >= a.max_retries or completed == 0 and not restart and retries > 0:
            print(f"run failed (exit {rc}) after {retries} retries", file=sys.stderr)
            return rc
        retries += 1
        restart = True
        print(f"auto-resume: relaunching with --restart into {output_dir} "
              f"(attempt {retries})", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
