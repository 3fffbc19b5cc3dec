"""Multi-host support: jax.distributed init + per-process read partitioning.

The reference's multi-node model is one UPC++ rank per core reading a
disjoint byte range of every input file (src/fastq.hpp:261-437), exchanging
k-mers via aggregated RPCs, and reducing summary scalars across ranks
(src/main.cpp:273-287).  The TPU equivalent is one JAX process per host:
`jax.distributed.initialize()` wires the processes, every process ingests its
pair-aware byte-range block of each FASTQ (io/fastq.read_fastq_block), the
device mesh spans ALL hosts' devices so the all_to_all owner routing rides
ICI within a slice and DCN across slices, and host scalars are reduced with
process_allgather.

Single-process runs (the common case in this repo's tests) take the same
code paths with process_count()==1 and zero collective overhead.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_initialize() -> tuple[int, int]:
    """Initialize jax.distributed when launched as a multi-process job.

    Returns (process_index, process_count).  On TPU pods the topology comes
    from the runtime env (jax.distributed.initialize() reads it);
    COORDINATOR_ADDRESS + NUM_PROCESSES + PROCESS_ID force it for CPU-based
    multi-process testing (tests/test_multiprocess.py).
    """
    if os.environ.get("COORDINATOR_ADDRESS"):
        # must run BEFORE any backend/device access (jax.process_count()
        # itself initializes the backend, so do NOT pre-check it)
        try:
            jax.distributed.initialize(
                coordinator_address=os.environ["COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("PROCESS_ID", "0")),
            )
        except RuntimeError as e:
            if jax.process_count() == 1:
                # backend was touched first, or the coordinator is gone: a
                # silent single-process fallback would duplicate work
                raise RuntimeError(
                    "COORDINATOR_ADDRESS is set but jax.distributed could not "
                    "initialize (was a device accessed before run_pipeline?)"
                ) from e
    elif _scheduler_multiprocess_env():
        # scheduler-launched multi-process job: JAX's cluster auto-detection
        # reads the SLURM / TPU-pod topology itself — the analogue of the
        # reference launcher's scheduler detection (src/mhm2.py:110-341),
        # owned by the runtime instead of the spawn script
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:
            if jax.process_count() == 1:
                raise RuntimeError(
                    "multi-task scheduler environment detected but "
                    "jax.distributed could not initialize"
                ) from e
    return jax.process_index(), jax.process_count()


def _scheduler_multiprocess_env() -> bool:
    """True only INSIDE a multi-task scheduler step (srun/TPU pod), where
    JAX's cluster auto-detection has enough to work with.  A >1-task
    allocation shell (salloc without srun) sets SLURM_NTASKS but not the
    per-task variables — initializing there would either fail detection or
    block waiting for peers that never start."""
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    try:
        ntasks = int(os.environ.get("SLURM_NTASKS") or "1")
    except ValueError:
        return False
    # per-task variables only srun sets (JAX's SlurmCluster needs them too)
    return ntasks > 1 and "SLURM_PROCID" in os.environ and (
        "SLURM_STEP_NODELIST" in os.environ
    )


def my_read_block(fname: str, paired: bool):
    """Iterable of this process's records of `fname` (the whole file when
    single-process — streamed, never materialized: reference-scale inputs are
    tens of GB and the old read_fastq() list OOM'd the host)."""
    from ..io.fastq import FastqReader, iter_batched, read_fastq_block

    rank, n = jax.process_index(), jax.process_count()
    if n == 1:
        rdr = FastqReader(fname)
        try:
            yield from iter_batched(rdr)
        finally:
            rdr.close()
        return
    yield from read_fastq_block(fname, rank, n, pair_aware=paired)


def host_local_rank() -> tuple[int, int]:
    """(rank among processes on THIS host, number of processes on this host)
    — the local_team() analogue (src/main.cpp:128).  Affinity splits must use
    host-local values: ranks on different hosts each see the whole machine."""
    n = jax.process_count()
    if n == 1:
        return 0, 1
    import socket

    from jax.experimental import multihost_utils

    me = jax.process_index()
    h = np.int64(hash(socket.gethostname()) & 0x7FFFFFFFFFFFFFFF)
    all_h = multihost_utils.process_allgather(np.asarray([h], np.int64)).ravel()
    mine = all_h == all_h[me]
    return int(mine[:me].sum()), int(mine.sum())


def allsum(x: int) -> int:
    """Sum a host scalar across processes (reduce_one/reduce_all analogue)."""
    if jax.process_count() == 1:
        return int(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([x], np.int64))
    return int(np.sum(arr))


def allmax(x: int) -> int:
    """Max of a host scalar across processes."""
    if jax.process_count() == 1:
        return int(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([x], np.int64))
    return int(np.max(arr))


def allsum_array(x: np.ndarray) -> np.ndarray:
    """Elementwise sum of a fixed-shape host array across processes."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(x))
    return np.sum(arr.reshape((-1,) + np.asarray(x).shape), axis=0)


def allstats(x: float) -> tuple[float, float, float, float]:
    """(min, mine, avg, max) of a host scalar across processes — the
    reference's min/my/avg/max balance reduction (upcxx_utils timers,
    reported at src/main.cpp:439)."""
    if jax.process_count() == 1:
        x = float(x)
        return x, x, x, x
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([x], np.float64))
    return float(arr.min()), float(x), float(arr.mean()), float(arr.max())


def barrier(name: str = "barrier"):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def put_global(x, sharding):
    """device_put that also works when `sharding` spans processes.

    `x` is the full global (numpy/jnp) value; every process passes the same
    shapes and each materializes only its addressable shards.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def make_global(sharding, local_rows: np.ndarray):
    """Assemble a global array from each process's local leading-axis rows
    (the device-feed analogue of per-rank FASTQ blocks)."""
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(sharding, local_rows)


def fetch(arr) -> np.ndarray:
    """np.asarray of a possibly cross-process array: replicates via a jitted
    identity (all processes must call this — SPMD), then reads locally.
    Intended for SMALL arrays (per-shard scalars)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = arr.sharding
    rep = NamedSharding(sharding.mesh, P())
    return np.asarray(jax.jit(lambda v: v, out_shardings=rep)(arr))


def local_shard_items(arr):
    """Yield (global_shard_index, numpy_block) for this process's shards of a
    leading-axis-sharded array; numpy_block has the leading axis dropped when
    each device holds exactly one row."""
    n_global = arr.shape[0]
    for s in getattr(arr, "addressable_shards", []):
        idx = s.index[0] if s.index else slice(None)
        start = idx.start or 0
        data = np.asarray(s.data)
        rows = data.shape[0]
        for r in range(rows):
            yield start + r, data[r]


def gather_objects(obj) -> list:
    """All-gather one small picklable object per process (ordered by process
    index) — carries the traversal's boundary-chain partials and other tiny
    irregular metadata; identity-wrapped when single-process."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = allsum_array(np.eye(jax.process_count(), dtype=np.int64)[
        jax.process_index()] * len(buf))
    blob = gather_concat(buf)
    out = []
    off = 0
    for n in lens:
        out.append(pickle.loads(blob[off : off + int(n)].tobytes()))
        off += int(n)
    return out


def gather_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays (axis 0, possibly unequal lengths)
    across processes; identity when single-process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    n = x.shape[0]
    n_max = allmax(n)
    pad_shape = (n_max - n,) + x.shape[1:]
    padded = np.concatenate([x, np.zeros(pad_shape, x.dtype)], axis=0)
    lens = multihost_utils.process_allgather(np.asarray([n], np.int64))
    alls = multihost_utils.process_allgather(padded)
    alls = alls.reshape((-1,) + padded.shape)
    return np.concatenate(
        [alls[p, : int(lens[p, 0])] for p in range(alls.shape[0])], axis=0
    )
