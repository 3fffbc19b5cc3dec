"""Multi-host support: jax.distributed init + per-process read partitioning.

The reference's multi-node model is one UPC++ rank per core reading a
disjoint byte range of every input file (src/fastq.hpp:261-437).  The TPU
equivalent is one JAX process per host: `jax.distributed.initialize()` wires
the processes (topology comes from the TPU runtime environment), every
process ingests its pair-aware byte-range block of each FASTQ
(io/fastq.read_fastq_block), the device mesh spans all hosts so the
all_to_all owner routing rides ICI within a slice and DCN across slices, and
summary scalars are reduced across processes.

Single-process runs (the common case in this repo's tests) take the same
code path with process_count()==1.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_initialize() -> tuple[int, int]:
    """Initialize jax.distributed when launched as a multi-process job.

    Returns (process_index, process_count).  Initialization is driven by the
    TPU runtime env (JAX reads it); COORDINATOR_ADDRESS forces it for
    CPU-based multi-process testing.
    """
    if os.environ.get("COORDINATOR_ADDRESS") and jax.process_count() == 1:
        try:
            jax.distributed.initialize(
                coordinator_address=os.environ["COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("PROCESS_ID", "0")),
            )
        except RuntimeError:
            pass  # already initialized
    return jax.process_index(), jax.process_count()


def my_read_block(fname: str, paired: bool) -> list:
    """This process's records of `fname` (whole file when single-process)."""
    from ..io.fastq import read_fastq, read_fastq_block

    rank, n = jax.process_index(), jax.process_count()
    if n == 1:
        return read_fastq(fname)
    return read_fastq_block(fname, rank, n, pair_aware=paired)


def allsum(x: int) -> int:
    """Sum a host scalar across processes (reduce_one/reduce_all analogue)."""
    if jax.process_count() == 1:
        return int(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([x], np.int64))
    return int(np.sum(arr))
