"""Contig-kmer insertion pass (--ctg-kmers): device rules vs the oracle."""

import numpy as np
import jax.numpy as jnp

from mhm2_kmer_analysis_v2_tpu.config import Options
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops
from mhm2_kmer_analysis_v2_tpu.oracle import OracleCounter
from mhm2_kmer_analysis_v2_tpu.table import shard_table

from util import genome_reads, oracle_count


def _insert_reads(table, reads, k):
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
        k=k, n_shards=1,
    )
    fl = {kk: v.reshape(-1) for kk, v in recs.items()}
    return shard_table.insert_batch(
        table, fl["canon_hi"], fl["canon_lo"], fl["left"], fl["right"],
        jnp.ones_like(fl["left"]), fl["valid"],
    )


def _insert_ctgs(table, ctgs, k, dmin_thres=2):
    seqs = [s for s, _ in ctgs]
    b = encode_batch(seqs, ["K" * len(s) for s in seqs])
    recs = kmer_ops.kmer_records(
        jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
        k=k, n_shards=1,
    )
    L = b.max_len
    depth = jnp.repeat(jnp.asarray([d for _, d in ctgs], jnp.int32), L)
    fl = {kk: v.reshape(-1) for kk, v in recs.items()}
    lut = jnp.asarray(shard_table._dmin_lut(dmin_thres))
    return shard_table.insert_ctg_batch(
        table, fl["canon_hi"], fl["canon_lo"], fl["left"], fl["right"],
        depth, fl["valid"], lut,
    )


def _fin_dict(table, k, dmin_thres=2):
    fin = shard_table.finalize(table, dmin_thres)
    vals, counts, left, right = shard_table.compact_to_host(fin)
    strs = shard_table.vals_to_strings(vals, k)
    return {s: (int(c), l, r) for s, c, l, r in zip(strs, counts, left, right)}


def test_ctg_rules_vs_oracle():
    k = 21
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), 400))
    reads = genome_reads(60, 70, genome_len=300, seed=7, err=0.02)
    # contigs: substrings of a different genome + of the read genome
    ctgs = []
    for i in range(8):
        p = int(rng.integers(0, 300))
        ctgs.append((genome[p : p + int(rng.integers(k + 2, 120))], int(rng.integers(1, 9))))
    # a deliberate conflicting duplicate contig pair (same kmers, shifted ext)
    base = genome[50:120]
    ctgs.append((base, 3))
    ctgs.append(("T" + base[:-1], 4))  # shares interior kmers, different exts

    oc = oracle_count(reads, k)
    for s, d in ctgs:
        oc.add_ctg_seq(s, d)

    table = shard_table.create(1 << 14)
    table = _insert_reads(table, reads, k)
    table = _insert_ctgs(table, ctgs, k)
    assert _fin_dict(table, k) == oc.finalize()


def test_ctg_overwrites_singletons_and_nonuu():
    k = 21
    reads = genome_reads(40, 60, genome_len=250, seed=9, err=0.05)  # noisy
    ctg = genome_reads(1, 200, genome_len=250, seed=9)[0][0]  # clean fragment
    oc = oracle_count(reads, k)
    oc.add_ctg_seq(ctg, 5)
    table = shard_table.create(1 << 14)
    table = _insert_reads(table, reads, k)
    table = _insert_ctgs(table, [(ctg, 5)], k)
    got = _fin_dict(table, k)
    assert got == oc.finalize()
    # the contig's interior kmers are present with depth 5 unless a read
    # entry was UU (kept) — either way counts agree with the oracle
    assert len(got) > 0


def test_ctg_pipeline_multi_k(tmp_path):
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), 600))
    reads = []
    for _ in range(150):
        p = int(rng.integers(0, 600 - 80))
        q = "".join(chr(53 + int(x)) for x in rng.integers(0, 20, 80))
        reads.append((genome[p : p + 80], q))
    fq = tmp_path / "s.fastq"
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    out = tmp_path / "out"
    options = Options(
        unpaired_fnames=[str(fq) + ":"], kmer_lens=[21, 33], output_dir=str(out),
        batch_reads=64, adapter_trim=False, ctg_kmers=True,
    )
    results = run_pipeline(options)
    assert len(results) == 2
    # k=33 round runs with k=21's contigs seeded through the multi-word ctg
    # pass (insert_ctg_batch_mw); both rounds produce contigs
    assert (out / "uutigs-21.fasta").exists()
    assert (out / "uutigs-33.fasta").exists()


def _insert_reads_mw(table, reads, k):
    from mhm2_kmer_analysis_v2_tpu.ops.kmer_multiword import kmer_records_mw, n_words
    from mhm2_kmer_analysis_v2_tpu.table import shard_table_mw as stmw

    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_records_mw(
        jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
        k=k, n_shards=1,
    )
    W = n_words(k)
    words = recs["canon"].reshape(W, -1)
    fl = {kk: v.reshape(-1) for kk, v in recs.items() if kk != "canon"}
    return stmw.insert_batch_mw(
        table, words, fl["left"], fl["right"], jnp.ones_like(fl["left"]),
        fl["valid"], w0_full_range=(k % 16 == 0),
    )


def test_ctg_rules_vs_oracle_multiword():
    from mhm2_kmer_analysis_v2_tpu.ops.kmer_multiword import kmer_records_mw, n_words
    from mhm2_kmer_analysis_v2_tpu.table import shard_table_mw as stmw

    k = 33
    rng = np.random.default_rng(21)
    genome = "".join(rng.choice(list("ACGT"), 400))
    reads = genome_reads(60, 90, genome_len=300, seed=21, err=0.02)
    ctgs = []
    for i in range(8):
        p = int(rng.integers(0, 300))
        ctgs.append((genome[p : p + int(rng.integers(k + 2, 120))], int(rng.integers(1, 9))))
    # conflicting duplicate pair: shared interior kmers, different exts
    base = genome[50:140]
    ctgs.append((base, 3))
    ctgs.append(("T" + base[:-1], 4))

    oc = oracle_count(reads, k)
    for s, d in ctgs:
        oc.add_ctg_seq(s, d)

    W = n_words(k)
    table = stmw.create(1 << 14, W)
    table = _insert_reads_mw(table, reads, k)

    seqs = [s for s, _ in ctgs]
    b = encode_batch(seqs, ["K" * len(s) for s in seqs])
    recs = kmer_records_mw(
        jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
        k=k, n_shards=1,
    )
    words = recs["canon"].reshape(W, -1)
    fl = {kk: v.reshape(-1) for kk, v in recs.items() if kk != "canon"}
    depth = jnp.repeat(jnp.asarray([d for _, d in ctgs], jnp.int32), b.max_len)
    lut = jnp.asarray(shard_table._dmin_lut(2))
    table = stmw.insert_ctg_batch_mw(
        table, words, fl["left"], fl["right"], depth, fl["valid"], lut
    )
    assert int(table.num_dropped) == 0

    fin = stmw.finalize_mw(table, 2)
    strs, counts, left, right = stmw.compact_to_host_mw(fin, k)
    got = {s: (int(c), l, r) for s, c, l, r in zip(strs, counts, left, right)}
    assert got == oc.finalize()


def test_ctg_pipeline_multiword(tmp_path):
    """analyze_kmers at k=33 applies the prev-round contig carryover."""
    from mhm2_kmer_analysis_v2_tpu.io.packed_reads import PackedReads
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import analyze_kmers

    rng = np.random.default_rng(23)
    genome = "".join(rng.choice(list("ACGT"), 800))
    k = 33
    reads = []
    for _ in range(150):
        p = int(rng.integers(0, 800 - 80))
        reads.append((genome[p : p + 80], "K" * 80))
    pr = PackedReads()
    for i, (s, q) in enumerate(reads):
        pr.add_read(f"r{i}/1", s, q)
    ctg = genome[100:500]
    options = Options(kmer_lens=[k], output_dir=str(tmp_path), batch_reads=64,
                      ctg_kmers=True, n_devices=1)
    res, fin, n_shards = analyze_kmers(pr, k, options, prev_ctgs=[(ctg, 4)])

    oc = oracle_count(reads, k)
    oc.add_ctg_seq(ctg, 4)
    exp = oc.finalize()
    assert res.unique_kmers == len(exp)
    assert res.total_kmer_count_sum == sum(c for c, _, _ in exp.values())


def test_ctg_pipeline_qf(tmp_path):
    """--use-qf + --ctg-kmers: the ctg pass runs against the QF main table.

    With every read k-mer occurring >= 2x (clean coverage), QF promotion puts
    all read entries in the main table and the result matches the exact
    oracle, proving the ctg rules apply identically in QF mode."""
    from mhm2_kmer_analysis_v2_tpu.io.packed_reads import PackedReads
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import analyze_kmers

    rng = np.random.default_rng(29)
    genome = "".join(rng.choice(list("ACGT"), 500))
    k = 21
    reads = []
    # tile the genome twice so every read k-mer count is >= 2 (deterministic
    # QF: no read singletons left in the filter at ctg time)
    for rep in range(2):
        for p in range(0, 500 - 80, 20):
            reads.append((genome[p : p + 80], "K" * 80))
    pr = PackedReads()
    for i, (s, q) in enumerate(reads):
        pr.add_read(f"r{i}/1", s, q)
    ctg = genome[50:400]
    options = Options(kmer_lens=[k], output_dir=str(tmp_path), batch_reads=64,
                      ctg_kmers=True, use_qf=True, n_devices=1)
    res, fin, n_shards = analyze_kmers(pr, k, options, prev_ctgs=[(ctg, 4)])

    oc = oracle_count(reads, k)
    oc.add_ctg_seq(ctg, 4)
    exp = oc.finalize()
    assert res.unique_kmers == len(exp)
    assert res.total_kmer_count_sum == sum(c for c, _, _ in exp.values())


def test_ctg_long_contig_windowing(tmp_path):
    """A contig far longer than the read length is windowed without losing or
    duplicating counted k-mers."""
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import analyze_kmers

    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), 3000))
    k = 21
    reads = []
    for _ in range(200):
        p = int(rng.integers(0, 3000 - 80))
        reads.append((genome[p : p + 80], "K" * 80))
    from mhm2_kmer_analysis_v2_tpu.io.packed_reads import PackedReads

    pr = PackedReads()
    for i, (s, q) in enumerate(reads):
        pr.add_read(f"r{i}/1", s, q)
    long_ctg = genome[:2500]
    options = Options(kmer_lens=[k], output_dir=str(tmp_path), batch_reads=64,
                      ctg_kmers=True, n_devices=1)
    res, fin, n_shards = analyze_kmers(pr, k, options, prev_ctgs=[(long_ctg, 4)])

    oc = oracle_count(reads, k)
    oc.add_ctg_seq(long_ctg, 4)
    exp = oc.finalize()
    assert res.unique_kmers == len(exp)
    assert res.total_kmer_count_sum == sum(c for c, _, _ in exp.values())
