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


def test_fmix32_and_route_hash_match_oracle():
    vals = [0, 1, 0xDEADBEEF, 0xFFFFFFFF, 12345]
    got = np.asarray(kmer_ops.fmix32(jnp.asarray(vals, dtype=jnp.uint32)))
    for v, g in zip(vals, got):
        assert int(g) == oracle.fmix32(v)
    h = np.asarray(
        kmer_ops.route_hash(
            jnp.asarray([7], dtype=jnp.uint32), jnp.asarray([9], dtype=jnp.uint32)
        )
    )
    assert int(h[0]) == oracle.route_hash(7, 9)


def test_minimizer_len_formula():
    # clamp(2k/3+1, 15, 27), src/kcount/kmer_dht.cpp:117-119
    assert kmer_ops.minimizer_len_for_k(21) == 15
    assert kmer_ops.minimizer_len_for_k(33) == 23
    assert kmer_ops.minimizer_len_for_k(55) == 27
    assert kmer_ops.minimizer_len_for_k(99) == 27
    for k in range(15, 160):
        assert kmer_ops.minimizer_len_for_k(k) == oracle.minimizer_len_for_k(k)


def _records(reads, k, n_shards):
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=n_shards,
    )
    return batch, {kk: np.asarray(v) for kk, v in recs.items()}


@pytest.mark.parametrize(
    "k,with_n", [(21, False), (21, True), (31, False), (32, False), (17, False), (16, False), (15, False)]
)
def test_kmer_records_vs_oracle(k, with_n):
    reads = random_reads(8, k + 2, 3 * k + 10, seed=k, with_n=with_n)
    n_shards = 5
    m = oracle.minimizer_len_for_k(k) if k >= 15 else k
    m = min(m, k)
    batch, recs = _records(reads, k, n_shards)
    canon = (recs["canon_hi"].astype(np.uint64) << np.uint64(32)) | recs["canon_lo"]

    for b, (seq, quals) in enumerate(reads):
        L = len(seq)
        good = [ord(q) >= 33 + 20 for q in quals]
        up = seq.upper()
        for i in range(batch.max_len):
            expect_valid = 1 <= i <= L - k - 1 and L >= k + 2
            assert bool(recs["valid"][b, i]) == expect_valid, (b, i)
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
                assert recs["left"][b, i] >= 4
            else:
                assert recs["left"][b, i] == li
            if ri is None:
                assert recs["right"][b, i] >= 4
            else:
                assert recs["right"][b, i] == ri
            assert int(recs["target"][b, i]) == oracle.kmer_target_shard(cv, k, n_shards, m)


@pytest.mark.parametrize("k,m", [(21, 15), (33 - 1, 16), (30, 17), (32, 27)])
def test_minimizer_selection_matches_reference(k, m):
    """The *selected* minimizer m-mer must be bit-exact with
    Kmer::get_minimizer_fast (src/kmer.cpp:349-398) for both the u32 and the
    pair (m>16) paths; routing = route_hash of the right-aligned pair."""
    rng = np.random.default_rng(7 + k + m)
    n_shards = 1 << 20
    for _ in range(30):
        kmer = "".join(rng.choice(list("ACGT"), k))
        v = oracle.kmer_to_val(kmer)
        exp_shard = oracle.kmer_target_shard(oracle.canonical_val(v, k)[0], k, n_shards, m)
        seq = "A" + kmer + "A"
        batch = encode_batch([seq], ["K" * len(seq)])
        recs = kmer_ops.kmer_records(
            jnp.asarray(batch.codes), jnp.asarray(batch.badq),
            jnp.asarray(batch.lengths), k=k, m=m, n_shards=n_shards,
        )
        assert int(np.asarray(recs["target"])[0, 1]) == exp_shard


def test_revcomp_pairs():
    rng = np.random.default_rng(3)
    for k in (15, 21, 32):
        for _ in range(5):
            s = "".join(rng.choice(list("ACGT"), k))
            v = oracle.kmer_to_val(s)
            hi = jnp.asarray([v >> 32], dtype=jnp.uint32)
            lo = jnp.asarray([v & 0xFFFFFFFF], dtype=jnp.uint32)
            rh, rl = kmer_ops.revcomp_pairs(hi, lo, k)
            rc = (int(np.asarray(rh)[0]) << 32) | int(np.asarray(rl)[0])
            assert rc == oracle.kmer_to_val(oracle.revcomp_str(s)), (k, s)
