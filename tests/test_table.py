"""Shard-table insert + finalize parity vs the oracle (single shard)."""

import numpy as np
import jax.numpy as jnp

from mhm2_kmer_analysis_v2_tpu import oracle
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops
from mhm2_kmer_analysis_v2_tpu.table import shard_table

from util import genome_reads, oracle_count, random_reads


def _insert_reads(reads, k, max_elems=1 << 14):
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=1,
    )
    table = shard_table.create(max_elems)
    flat = {kk: v.reshape(-1) for kk, v in recs.items()}
    table = shard_table.insert_batch(
        table, flat["canon"], flat["left"], flat["right"],
        jnp.ones_like(flat["left"]), flat["valid"],
    )
    return table


def _table_dict(table):
    keys = np.asarray(table.keys)
    occ = keys != np.uint64(0xFFFFFFFFFFFFFFFF)
    counts = np.asarray(table.counts)[occ]
    extc = np.asarray(table.extc)[occ]
    return {
        int(kv): (int(c), list(map(int, e)))
        for kv, c, e in zip(keys[occ], counts, extc)
    }


def test_insert_counts_match_oracle():
    k = 21
    reads = genome_reads(60, 70, genome_len=400, seed=5)
    table = _insert_reads(reads, k)
    oc = oracle_count(reads, k)
    got = _table_dict(table)
    assert int(table.num_dropped) == 0
    assert len(got) == len(oc.table)
    for kv, e in oc.table.items():
        assert kv in got, oracle.val_to_kmer(kv, k)
        c, extc = got[kv]
        assert c == e.count
        assert extc[:4] == e.left
        assert extc[4:] == e.right


def test_insert_multi_batch_accumulates():
    k = 21
    reads = genome_reads(40, 60, genome_len=300, seed=9)
    batchA, batchB = reads[:20], reads[20:]
    tableA = _insert_reads(reads, k)

    # same reads split into two insert calls
    b1 = encode_batch([s for s, _ in batchA], [q for _, q in batchA])
    b2 = encode_batch([s for s, _ in batchB], [q for _, q in batchB])
    table = shard_table.create(1 << 14)
    for b in (b1, b2):
        recs = kmer_ops.kmer_records(
            jnp.asarray(b.codes), jnp.asarray(b.badq),
            jnp.asarray(b.lengths), k=k, n_shards=1,
        )
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        table = shard_table.insert_batch(
            table, flat["canon"], flat["left"], flat["right"],
            jnp.ones_like(flat["left"]), flat["valid"],
        )
    assert _table_dict(tableA) == _table_dict(table)


def test_finalize_matches_oracle():
    k = 21
    reads = genome_reads(80, 70, genome_len=500, seed=11, err=0.01)
    reads += random_reads(10, k + 2, 80, seed=12)  # singleton noise
    table = _insert_reads(reads, k)
    fin = shard_table.finalize(table, dmin_thres=2)
    vals, counts, left, right = shard_table.compact_to_host(fin)
    strings = shard_table.vals_to_strings(vals, k)
    got = {s: (int(c), l, r) for s, c, l, r in zip(strings, counts, left, right)}

    oc = oracle_count(reads, k)
    exp = oc.finalize()
    assert got == exp
    assert int(np.sum(np.asarray(fin.num_kept))) == len(exp)
    assert int(np.sum(np.asarray(fin.sum_counts))) == sum(c for c, _, _ in exp.values())


def test_ext_call_tie_break():
    """Equal top counts -> 'F' only if runner >= dmin; char tie-break T>G>C>A
    (src/kcount/kcount_cpu.cpp:135-145)."""
    import jax

    extc4 = jnp.asarray([
        [5, 0, 0, 0],   # clear A
        [0, 3, 3, 0],   # C/G tie at 3, count such that dmin<=3 -> F
        [1, 0, 0, 1],   # A/T tie at 1 with dmin 2 -> X
        [0, 0, 0, 0],   # all zero -> X
        [2, 2, 0, 0],   # A/C tie, dmin=2 -> F
    ], dtype=jnp.int32)
    dmin = jnp.asarray([2, 2, 2, 2, 2], dtype=jnp.int32)
    ext = np.asarray(shard_table._call_ext(extc4, dmin))
    assert list(ext) == [0, shard_table.EXT_F, shard_table.EXT_X,
                         shard_table.EXT_X, shard_table.EXT_F]

    # tie below dmin: top==runner but both < F threshold and >= dmin?
    # top=1 runner=1 dmin=1 -> F (runner >= dmin)
    ext2 = np.asarray(shard_table._call_ext(
        jnp.asarray([[1, 0, 0, 1]], dtype=jnp.int32), jnp.asarray([1], dtype=jnp.int32)))
    assert list(ext2) == [shard_table.EXT_F]


def test_dmin_lut_matches_c_double_semantics():
    """(int)((1.0-0.9)*count) in C truncates the *double* product; multiples of
    10 land just below the integer (src/kcount/kcount_cpu.cpp:178)."""
    lut = shard_table._dmin_lut(0)
    for c in range(0, 65536):
        assert lut[c] == int((1.0 - 0.9) * c), c
    # spot-check the interesting boundary behavior
    assert lut[10] == 0 and lut[20] == 1 and lut[30] == 2
    assert lut[11] == 1 and lut[29] == 2


def test_saturation():
    """Counts and ext counts saturate at uint16 max like inc_with_limit."""
    k = 21
    kmer = "ACGTACGTACGTACGTACGTA"
    seq = "C" + kmer + "G"
    reads = [(seq, "K" * len(seq))] * 3
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=1,
    )
    table = shard_table.create(64)
    flat = {kk: v.reshape(-1) for kk, v in recs.items()}
    # claim count 60000 per record x3 -> saturates to 65535
    table = shard_table.insert_batch(
        table, flat["canon"], flat["left"], flat["right"],
        jnp.full_like(flat["left"], 60000), flat["valid"],
    )
    fin = shard_table.finalize(table)
    vals, counts, left, right = shard_table.compact_to_host(fin)
    assert len(counts) == 1
    assert counts[0] == 65535
