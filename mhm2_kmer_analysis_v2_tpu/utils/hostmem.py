"""Host-side array allocation helpers.

In this container, first-touch page faults on malloc'd anonymous memory
(np.empty / np.full) are ~100x slower than on calloc-backed pages
(np.zeros): measured 4.2-5.1 s vs 33-44 ms per fresh 64 MB.  numpy's
small-block cache hides this for warm re-allocations, but every *growing*
buffer in the ingest/contig hot paths pays the cold cost.  These helpers
route large host allocations through np.zeros.

(Device-side jnp allocations are unaffected; XLA manages HBM itself.)
"""

import numpy as np

# below this size the fault cost is noise; keep numpy's fast path
_SMALL = 1 << 16


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
