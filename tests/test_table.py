"""Shard-table insert + finalize parity vs the oracle (single shard)."""

import numpy as np
import jax.numpy as jnp

from mhm2_kmer_analysis_v2_tpu import oracle
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops
from mhm2_kmer_analysis_v2_tpu.table import shard_table

from util import genome_reads, oracle_count, random_reads


def _flat_records(reads, k):
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=1,
    )
    return {kk: v.reshape(-1) for kk, v in recs.items()}


def _insert_reads(reads, k, max_elems=1 << 14, cnt=None):
    flat = _flat_records(reads, k)
    table = shard_table.create(max_elems)
    c = jnp.ones_like(flat["left"]) if cnt is None else jnp.full_like(flat["left"], cnt)
    return shard_table.insert_batch(
        table, flat["canon_hi"], flat["canon_lo"], flat["left"], flat["right"],
        c, flat["valid"],
    )


def _table_dict(table):
    hi = np.asarray(table.keys_hi).astype(np.uint64)
    lo = np.asarray(table.keys_lo).astype(np.uint64)
    occ = (hi != 0xFFFFFFFF) | (lo != 0xFFFFFFFF)
    keys = (hi[occ] << np.uint64(32)) | lo[occ]
    # read-path counts are derived from the five left buckets (bucket 8 =
    # invalid left); the counts word is only written by the ctg pass
    extc9 = np.asarray(table.extc).reshape(9, -1).T[occ]  # bucket-major
    counts = extc9[:, :4].sum(axis=1) + extc9[:, 8]
    extc = extc9[:, :8]
    return {
        int(kv): (int(c), list(map(int, e)))
        for kv, c, e in zip(keys, counts, extc)
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
    # the claim scratch is deliberately NOT reset between batches: every
    # lane that reads claim[slot] scattered there in the same sweep, so
    # stale values are never observed (saves one scatter per sweep)


def test_insert_multi_batch_accumulates():
    k = 21
    reads = genome_reads(40, 60, genome_len=300, seed=9)
    tableA = _insert_reads(reads, k)

    # same reads split into two insert calls
    table = shard_table.create(1 << 14)
    for chunk in (reads[:20], reads[20:]):
        flat = _flat_records(chunk, k)
        table = shard_table.insert_batch(
            table, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], jnp.ones_like(flat["left"]), flat["valid"],
        )
    assert _table_dict(tableA) == _table_dict(table)


def test_high_collision_small_table():
    """Tiny table forces long probe chains and intra-batch slot conflicts."""
    k = 21
    reads = genome_reads(30, 50, genome_len=200, seed=13)
    oc = oracle_count(reads, k)
    # capacity just above unique-kmer count -> heavy probing, no drops
    table = _insert_reads(reads, k, max_elems=len(oc.table) + 8)
    got = _table_dict(table)
    if int(table.num_dropped) == 0:
        assert len(got) == len(oc.table)
        for kv, e in oc.table.items():
            assert got[kv][0] == e.count


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
    rows = np.asarray([
        [5, 0, 0, 0],   # clear A
        [0, 3, 3, 0],   # C/G tie at 3, dmin 2 -> F
        [1, 0, 0, 1],   # A/T tie at 1 with dmin 2 -> X
        [0, 0, 0, 0],   # all zero -> X
        [2, 2, 0, 0],   # A/C tie, dmin 2 -> F
    ], dtype=np.int32)
    # _call_ext takes a LIST of per-base planes (bucket-major layout)
    extc4 = [jnp.asarray(rows[:, b]) for b in range(4)]
    dmin = jnp.asarray([2, 2, 2, 2, 2], dtype=jnp.int32)
    ext = np.asarray(shard_table._call_ext(extc4, dmin))
    assert list(ext) == [0, shard_table.EXT_F, shard_table.EXT_X,
                         shard_table.EXT_X, shard_table.EXT_F]

    # top==runner at dmin=1 -> F (runner >= dmin)
    ext2 = np.asarray(shard_table._call_ext(
        [jnp.asarray([v], dtype=jnp.int32) for v in (1, 0, 0, 1)],
        jnp.asarray([1], dtype=jnp.int32)))
    assert list(ext2) == [shard_table.EXT_F]


def test_dmin_lut_matches_c_double_semantics():
    """(int)((1.0-0.9)*count) in C truncates the *double* product; multiples of
    10 land just below the integer (src/kcount/kcount_cpu.cpp:178)."""
    lut = shard_table._dmin_lut(0)
    for c in range(0, 65536):
        assert lut[c] == int((1.0 - 0.9) * c), c
    assert lut[10] == 0 and lut[20] == 1 and lut[30] == 2
    assert lut[11] == 1 and lut[29] == 2


def test_saturation():
    """Counts and ext counts saturate at uint16 max like inc_with_limit
    (src/kcount/kcount_cpu.cpp:152-171)."""
    k = 21
    kmer = "ACGTACGTACGTACGTACGTA"
    seq = "C" + kmer + "G"
    reads = [(seq, "K" * len(seq))] * 3
    table = _insert_reads(reads, k, max_elems=64, cnt=60000)
    fin = shard_table.finalize(table)
    vals, counts, left, right = shard_table.compact_to_host(fin)
    assert len(counts) == 1
    assert counts[0] == 65535


def test_probe_stats():
    k = 21
    reads = genome_reads(60, 70, genome_len=400, seed=5)
    table = _insert_reads(reads, k)
    from mhm2_kmer_analysis_v2_tpu.table.shard_table import probe_stats

    st = probe_stats(table)
    assert st["occupied"] == len(oracle_count(reads, k).table)
    assert 0 < st["load_factor"] < 1
    assert st["avg_probe"] >= 1.0
    assert st["max_probe"] >= 1


def test_full_hi_range_sentinel_kmer_k32():
    """k=32 kmers whose canonical hi word equals the EMPTY sentinel
    (e.g. T^16 A^16, a palindrome) must insert correctly — this is the case
    that forces full_hi_range=True (the single-gather emptiness probe would
    mistake the stored key for an empty slot)."""
    import jax.numpy as jnp
    from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
    from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops

    k = 32
    seq = "C" + "T" * 16 + "A" * 16 + "G"  # one counted position
    reads = [(seq, "K" * len(seq))] * 3
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
        k=k, n_shards=1,
    )
    flat = {kk: v.reshape(-1) for kk, v in recs.items()}
    assert int(jnp.max(jnp.where(flat["valid"], flat["canon_hi"], 0))) == 0xFFFFFFFF
    table = shard_table.create(256)
    table = shard_table.insert_batch(
        table, flat["canon_hi"], flat["canon_lo"], flat["left"],
        flat["right"], jnp.ones_like(flat["left"]), flat["valid"],
        full_hi_range=True,
    )
    fin = shard_table.finalize(table)
    vals, counts, left, right = shard_table.compact_to_host(fin)
    assert len(vals) == 1 and counts[0] == 3
    assert shard_table.vals_to_strings(vals, k)[0] == "T" * 16 + "A" * 16


def test_probe_stats_device_matches_host():
    """Device-side probe/load reducer (a few scalars D2H) == the host
    displacement-inversion stats, single-word and multi-word."""
    import jax.numpy as jnp
    import numpy as np
    from mhm2_kmer_analysis_v2_tpu.table import shard_table as st
    from mhm2_kmer_analysis_v2_tpu.table import shard_table_mw as stmw

    rng = np.random.default_rng(12)
    t = st.create(6000)
    n = 3500
    hi = rng.integers(0, 1 << 20, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n).astype(np.uint32)
    tbl = st.insert_batch(
        t, jnp.asarray(hi), jnp.asarray(lo), jnp.zeros(n, jnp.int32),
        jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.int32), jnp.ones(n, bool),
    )
    host = st.probe_stats(tbl)
    dev = st.probe_stats_device(tbl.keys_hi[None], tbl.keys_lo[None])
    assert int(dev["occupied"][0]) == host["occupied"]
    assert abs(float(dev["avg_probe"][0]) - host["avg_probe"]) < 1e-9
    assert int(dev["max_probe"][0]) == host["max_probe"]

    # multi-word: occupancy + load factor sanity (probe lengths follow the
    # same schedule inversion)
    k = 64
    W = 4
    tm = stmw.create(5000, W)
    words = jnp.asarray(rng.integers(0, 1 << 32, (W, 2000)).astype(np.uint32))
    tblm = stmw.insert_batch_mw(
        tm, words, jnp.zeros(2000, jnp.int32), jnp.zeros(2000, jnp.int32),
        jnp.ones(2000, jnp.int32), jnp.ones(2000, bool), w0_full_range=True,
    )
    devm = stmw.probe_stats_device_mw(tblm.keys[None], W)
    occ = (
        np.asarray(tblm.keys).reshape(W, -1) != 0xFFFFFFFF
    ).any(axis=0).sum()
    assert int(devm["occupied"][0]) == int(occ)
    assert int(devm["max_probe"][0]) >= 1
