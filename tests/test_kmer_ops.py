"""Kernel-level parity: JAX kmer ops vs the pure-Python oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_kmer_analysis_v2_tpu import oracle
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops

from util import random_reads


def test_quick_hash_bit_exact():
    vals = np.array([0, 1, 2, 12345678901234567, 2**63, 2**64 - 1], dtype=np.uint64)
    got = np.asarray(kmer_ops.quick_hash(jnp.asarray(vals)))
    for v, g in zip(vals, got):
        assert int(g) == oracle.quick_hash(int(v))


def test_minimizer_len_formula():
    # clamp(2k/3+1, 15, 27), src/kcount/kmer_dht.cpp:117-119
    assert kmer_ops.minimizer_len_for_k(21) == 15
    assert kmer_ops.minimizer_len_for_k(33) == 23
    assert kmer_ops.minimizer_len_for_k(55) == 27
    assert kmer_ops.minimizer_len_for_k(99) == 27
    for k in range(15, 160):
        assert kmer_ops.minimizer_len_for_k(k) == oracle.minimizer_len_for_k(k)


@pytest.mark.parametrize("k,with_n", [(21, False), (21, True), (31, False), (32, False), (17, False)])
def test_kmer_records_vs_oracle(k, with_n):
    reads = random_reads(8, k + 2, 3 * k + 10, seed=k, with_n=with_n)
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    n_shards = 5
    m = oracle.minimizer_len_for_k(k)
    recs = kmer_ops.kmer_records(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=n_shards,
    )
    canon = np.asarray(recs["canon"])
    left = np.asarray(recs["left"])
    right = np.asarray(recs["right"])
    tgt = np.asarray(recs["target"])
    valid = np.asarray(recs["valid"])

    for b, (seq, quals) in enumerate(reads):
        L = len(seq)
        good = [ord(q) >= 33 + 20 for q in quals]
        up = seq.upper()
        for i in range(batch.max_len):
            expect_valid = 1 <= i <= L - k - 1 and L >= k + 2
            assert bool(valid[b, i]) == expect_valid, (b, i)
            if not expect_valid:
                continue
            v = oracle.kmer_to_val(up[i : i + k])
            cv, flipped = oracle.canonical_val(v, k)
            l = up[i - 1] if good[i - 1] else "0"
            r = up[i + k] if good[i + k] else "0"
            if flipped:
                l, r = oracle._COMP[r], oracle._COMP[l]
            li = oracle._CODE[l] if l in "ACGT" else None
            ri = oracle._CODE[r] if r in "ACGT" else None
            assert int(canon[b, i]) == cv, (b, i)
            if li is None:
                assert left[b, i] >= 4
            else:
                assert left[b, i] == li
            if ri is None:
                assert right[b, i] >= 4
            else:
                assert right[b, i] == ri
            assert int(tgt[b, i]) == oracle.kmer_target_shard(cv, k, n_shards, m)


def test_minimizer_matches_reference_value():
    """The minimizer uint64 (left-aligned, least-complement, greatest) must be
    bit-exact with Kmer::get_minimizer_fast (src/kmer.cpp:349-398)."""
    rng = np.random.default_rng(7)
    k, m = 21, 15
    for _ in range(50):
        kmer = "".join(rng.choice(list("ACGT"), k))
        v = oracle.kmer_to_val(kmer)
        exp = oracle.minimizer(v, k, m)
        # via kmer_records on a read where this kmer is in counted position 1
        seq = "A" + kmer + "A"
        batch = encode_batch([seq], ["K" * len(seq)])
        recs = kmer_ops.kmer_records(
            jnp.asarray(batch.codes), jnp.asarray(batch.badq),
            jnp.asarray(batch.lengths), k=k, n_shards=1 << 20,
        )
        got_target = int(np.asarray(recs["target"])[0, 1])
        assert got_target == oracle.quick_hash(exp) % (1 << 20)


def test_revcomp_vals():
    rng = np.random.default_rng(3)
    k = 21
    for _ in range(10):
        s = "".join(rng.choice(list("ACGT"), k))
        v = oracle.kmer_to_val(s)
        rc = int(np.asarray(kmer_ops.revcomp_vals(jnp.asarray([v], dtype=jnp.uint64), k))[0])
        assert rc == oracle.kmer_to_val(oracle.revcomp_str(s))
