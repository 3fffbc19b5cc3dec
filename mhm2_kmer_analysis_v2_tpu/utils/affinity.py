"""Process CPU pinning — the set_process_affinity analogue
(src/main.cpp:92-104, pin helpers src/utils.hpp:86-104).

The reference pins each UPC++ rank by logical cpu / physical core / NUMA
domain (--pin, default numa, env override MHM2_PIN, src/options.cpp:332-336).
Here one JAX process per host plays the rank role: pinning keeps the host
feed threads (ingest, prefetch staging, OpenMP merge) off the cores XLA's
runtime threads occupy when several processes share a test host, and is a
no-op-with-log when the platform lacks sched_setaffinity.
"""

from __future__ import annotations

import glob
import os

from .logging import slog_verbose


def _parse_cpulist(text: str) -> list:
    """'0-3,8,10-11' -> [0,1,2,3,8,10,11]."""
    out: list = []
    for part in text.strip().split(","):
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return out


def _numa_domains() -> list:
    """CPU lists per NUMA node (fallback: one domain of all CPUs)."""
    domains = []
    for path in sorted(glob.glob("/sys/devices/system/node/node[0-9]*/cpulist")):
        try:
            cpus = _parse_cpulist(open(path).read())
        except OSError:
            continue
        if cpus:
            domains.append(cpus)
    if not domains:
        domains = [sorted(os.sched_getaffinity(0))]
    return domains


def _core_groups(cpus: list) -> list:
    """Group logical CPUs into physical cores via thread_siblings_list."""
    seen = set()
    groups = []
    for c in cpus:
        if c in seen:
            continue
        path = f"/sys/devices/system/cpu/cpu{c}/topology/thread_siblings_list"
        try:
            sibs = [s for s in _parse_cpulist(open(path).read()) if s in set(cpus)]
        except OSError:
            sibs = [c]
        seen.update(sibs)
        groups.append(sorted(sibs) or [c])
    return groups


def set_process_affinity(pin_by: str, rank: int = 0, local_n: int = 1):
    """Pin this process per --pin (cpu | core | numa | rr_numa | none).

    rank/local_n: this process's index and the number of processes sharing
    the host (ranks on different hosts see the full machine each).
    """
    if pin_by == "none" or not hasattr(os, "sched_setaffinity"):
        return
    if local_n <= 1:
        # one process per host (the standard TPU topology): restricting the
        # lone feeder to a CPU/core/NUMA slice would idle the rest of the
        # host for nothing — the reference's pin targets many-ranks-per-node
        slog_verbose("Single process on this host: leaving affinity unrestricted")
        return
    try:
        avail = sorted(os.sched_getaffinity(0))
        if not avail:
            return
        if pin_by == "cpu":
            # even logical-CPU split across local ranks (pin_cpu)
            per = max(1, len(avail) // max(local_n, 1))
            lo = (rank % max(local_n, 1)) * per
            cpus = avail[lo:lo + per] or [avail[rank % len(avail)]]
        elif pin_by == "core":
            # physical-core split: each rank gets its cores' hw threads
            groups = _core_groups(avail)
            per = max(1, len(groups) // max(local_n, 1))
            lo = (rank % max(local_n, 1)) * per
            mine = groups[lo:lo + per] or [groups[rank % len(groups)]]
            cpus = [c for g in mine for c in g]
        elif pin_by in ("numa", "rr_numa"):
            domains = _numa_domains()
            if pin_by == "numa":
                # block distribution of ranks over domains (pin_numa)
                d = (rank * len(domains)) // max(local_n, 1)
            else:
                # round-robin distribution (pin_numa(true))
                d = rank % len(domains)
            cpus = [c for c in domains[min(d, len(domains) - 1)] if c in set(avail)]
            cpus = cpus or avail
        else:
            # unknown value (e.g. a typo'd MHM2_PIN env default): log, don't
            # crash the pipeline
            slog_verbose("Unknown --pin mode ", repr(pin_by), "; not pinning")
            return
        os.sched_setaffinity(0, cpus)
        slog_verbose(
            "Pinned process (", pin_by, ") to CPUs ",
            ",".join(map(str, cpus[:16])), "..." if len(cpus) > 16 else "",
        )
    except OSError as e:
        slog_verbose("Could not pin process (", pin_by, "): ", e)
