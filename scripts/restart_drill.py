#!/usr/bin/env python3
"""Kill + auto-resume drill at scale (VERDICT r3 task 3).

Launches the pipeline under scripts/mhm2_tpu.py --auto-resume, waits for the
"Completed contig round k = <K>" log marker, SIGKILLs the APP process (the
exact child PID — never a pattern), and lets the launcher relaunch with
--restart into the same output dir (the src/mhm2.py:925-937 operational
story).  Exits with the launcher's final status; compare the output dir
against an uninterrupted run with scripts/verify_scale.py + diff.

Usage:
  python scripts/restart_drill.py --out DIR --kill-after-k 21 -- \
      -r reads.fastq -k 21 33 55 --ctg-kmers --dump-kmers --checkpoint
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def app_children(launcher_pid: int) -> list:
    """PIDs of pipeline.main processes whose parent is the launcher."""
    out = subprocess.run(
        ["ps", "-o", "pid=,args=", "--ppid", str(launcher_pid)],
        capture_output=True, text=True,
    ).stdout
    pids = []
    for line in out.splitlines():
        parts = line.strip().split(None, 1)
        if len(parts) == 2 and "pipeline.main" in parts[1]:
            pids.append(int(parts[0]))
    return pids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--kill-after-k", type=int, required=True)
    ap.add_argument("app_args", nargs=argparse.REMAINDER)
    a = ap.parse_args()
    app_args = [x for x in a.app_args if x != "--"]

    marker = f"Completed contig round k = {a.kill_after_k}"
    log_path = os.path.join(a.out, "mhm2.log")
    launcher = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(__file__), "mhm2_tpu.py"),
         "--auto-resume", "-o", a.out, "--", *app_args],
    )
    killed = False
    while launcher.poll() is None:
        if not killed and os.path.exists(log_path):
            try:
                txt = open(log_path).read()
            except OSError:
                txt = ""
            if marker in txt:
                # marker seen: SIGKILL the app (not the launcher) mid-flight
                for pid in app_children(launcher.pid):
                    print(f"# restart_drill: marker seen, SIGKILL app pid {pid}",
                          flush=True)
                    try:
                        os.kill(pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    killed = True
        time.sleep(2.0)
    if not killed:
        print("# restart_drill: WARNING — run finished before the kill marker",
              file=sys.stderr)
    sys.exit(launcher.returncode)


if __name__ == "__main__":
    main()
