"""Shared test helpers: random read generation and oracle comparison."""

from __future__ import annotations

import numpy as np

from mhm2_kmer_analysis_v2_tpu.oracle import OracleCounter


def random_reads(n, min_len, max_len, seed=0, with_n=False, qual_range=(35, 73)):
    """Generate (seq, quals) pairs; qualities span below/above the 33+20 cutoff."""
    rng = np.random.default_rng(seed)
    alphabet = list("ACGTN") if with_n else list("ACGT")
    probs = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    reads = []
    for _ in range(n):
        L = int(rng.integers(min_len, max_len + 1))
        seq = "".join(rng.choice(alphabet, L, p=probs))
        quals = "".join(chr(int(q)) for q in rng.integers(*qual_range, L))
        reads.append((seq, quals))
    return reads


def genome_reads(n, read_len, genome_len=2000, depth_seed=1, seed=0, err=0.0):
    """Reads sampled from one random genome (gives count>=2 kmers so the
    finalize stage keeps something)."""
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), genome_len))
    reads = []
    for _ in range(n):
        pos = int(rng.integers(0, genome_len - read_len + 1))
        seq = list(genome[pos : pos + read_len])
        if err > 0:
            for i in range(len(seq)):
                if rng.random() < err:
                    seq[i] = "ACGT"[int(rng.integers(4))]
        if rng.random() < 0.5:
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            seq = [comp[c] for c in reversed(seq)]
        quals = "".join(chr(int(q)) for q in rng.integers(35, 73, read_len))
        reads.append(("".join(seq), quals))
    return reads


def oracle_count(reads, k, qual_offset=33, dmin_thres=2):
    oc = OracleCounter(k, qual_offset=qual_offset, dmin_thres=dmin_thres)
    for seq, quals in reads:
        oc.add_read(seq, quals)
    return oc
