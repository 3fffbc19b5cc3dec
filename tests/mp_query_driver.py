"""2-process driver for the collective point-query path (run by
tests/test_multiprocess.py): each process counts ITS half of a shared read
set through the KmerDHT facade and queries its OWN k-mer list — the any-rank
RPC get of KmerDHT::get_kmer_count (src/kcount/kmer_dht.cpp:216-245)."""

import sys

import numpy as np


def main():
    import jax

    from mhm2_kmer_analysis_v2_tpu.parallel import distributed as dist

    rank, n_proc = dist.maybe_initialize()
    assert n_proc == 2, n_proc
    from jax.sharding import Mesh

    from mhm2_kmer_analysis_v2_tpu.models import KmerDHT
    from mhm2_kmer_analysis_v2_tpu.oracle import (
        OracleCounter, kmer_to_val, val_to_kmer)

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 21

    rng = np.random.default_rng(77)
    rlen = max(70, k + 40)  # reads must cover k-mers at every tested k
    glen = max(500, 4 * rlen)
    genome = "".join(rng.choice(list("ACGT"), glen))
    reads = []
    for _ in range(80):
        pos = int(rng.integers(0, glen - rlen))
        reads.append(genome[pos : pos + rlen])

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("sh",))
    dht = KmerDHT(mesh, k, 1 << 13)
    mine = reads[rank::2]
    # pad to this process's shard rows with empty reads
    local_shards = mesh.shape["sh"] // n_proc
    pad = -len(mine) % local_shards
    dht.add_read_strings(mine + [""] * pad)

    # oracle over ALL reads
    oc = OracleCounter(k)
    for s in reads:
        oc.add_read(s, "I" * len(s))
    vals = sorted(oc.table)
    # DIFFERENT query lists per process (plus a known-absent k-mer)
    my_vals = vals[rank::3][:25]
    kmers = [val_to_kmer(v, k) for v in my_vals] + ["C" * k]
    got = dht.get_kmer_counts(kmers)
    cval = kmer_to_val("C" * k)
    want = [oc.table[v].count for v in my_vals] + [
        oc.table[cval].count if cval in oc.table else 0
    ]
    assert got == want, (rank, got, want)
    print(f"MP_QUERY_OK rank={rank} n={len(kmers)}")


if __name__ == "__main__":
    main()
