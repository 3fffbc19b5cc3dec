"""TPU-native distributed k-mer analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the MHM2 k-mer analysis proxy app
(reference: LoganWilliams1/mhm2_kmer_analysis_v2). The reference's UPC++/GASNet
aggregated-RPC hash table becomes a hash-sharded HBM table over a TPU device
mesh with all_to_all supermer/k-mer routing; its CUDA kernels become
vectorized XLA/Pallas compute.

64-bit integer mode is required package-wide: k-mer values, minimizers and
hashes are uint64 (XLA emulates these on TPU with 32-bit pairs).
"""

import jax

jax.config.update("jax_enable_x64", True)

from .utils.hostmem import tune_malloc

# large-allocation page reuse for every host-side numpy hot path (see
# hostmem.tune_malloc: cold mmap first-touch is ~100x in this container)
tune_malloc()

__version__ = "0.1.0"
