"""Singleton filter (--use-qf analogue): finalized-output equivalence.

Singletons live only in the filter and are purged at finalize anyway, so
QF-mode runs must produce the same finalized table as plain mode on data
without pathological filter-hole interactions (the reference documents its
TCF as having 'a negligible amount of variation', README_v2.md:91 — exact
parity testing keeps --use-qf off, SURVEY §4)."""

import numpy as np
import jax.numpy as jnp

from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops
from mhm2_kmer_analysis_v2_tpu.table import shard_table, singleton_filter as sf

from util import genome_reads, oracle_count, random_reads


def _flat(reads, k):
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
        k=k, n_shards=1,
    )
    return {kk: v.reshape(-1) for kk, v in recs.items()}


def _fin_dict(table, k):
    fin = shard_table.finalize(table)
    vals, counts, left, right = shard_table.compact_to_host(fin)
    strs = shard_table.vals_to_strings(vals, k)
    return {s: (int(c), l, r) for s, c, l, r in zip(strs, counts, left, right)}


def test_qf_equivalent_finalized_output():
    k = 21
    reads = genome_reads(100, 70, genome_len=400, seed=31, err=0.01)
    reads += random_reads(20, k + 2, 70, seed=32)  # singleton noise

    plain = shard_table.create(1 << 14)
    qf = shard_table.create(1 << 14)
    filt = sf.create_filter(1 << 12)
    for chunk in (reads[:40], reads[40:80], reads[80:]):
        flat = _flat(chunk, k)
        one = jnp.ones_like(flat["left"])
        plain = shard_table.insert_batch(
            plain, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], one, flat["valid"],
        )
        qf, filt = sf.insert_batch_qf(
            qf, filt, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], one, flat["valid"],
        )
    exp = _fin_dict(plain, k)
    got = _fin_dict(qf, k)
    assert got == exp
    # oracle agreement too
    assert exp == oracle_count(reads, k).finalize()


def test_qf_keeps_singletons_out_of_main_table():
    k = 21
    # all-singleton batch: nothing should land in the main table
    reads = random_reads(30, k + 2, 60, seed=33)
    flat = _flat(reads, k)
    table = shard_table.create(1 << 14)
    filt = sf.create_filter(1 << 13)
    one = jnp.ones_like(flat["left"])
    table, filt = sf.insert_batch_qf(
        table, filt, flat["canon_hi"], flat["canon_lo"], flat["left"],
        flat["right"], one, flat["valid"],
    )
    n_main = shard_table.num_elems(table)
    occ = sf.filter_occupancy(filt)
    # random 60bp reads over 4^21 space: essentially all kmers unique
    assert occ > 0
    assert n_main < occ / 4  # main stays (nearly) empty vs filter
    # memory claim: filter bytes/slot is ~4.5x smaller than the main table's
    per_slot_main = (
        table.keys_hi.nbytes + table.keys_lo.nbytes + table.counts.nbytes
        + table.extc.nbytes + table.claim.nbytes
    ) / table.capacity
    per_slot_filter = sf.filter_memory_bytes(filt) / filt.capacity
    assert per_slot_filter * 3 < per_slot_main


def test_qf_promotion_across_batches():
    k = 21
    seq = "C" + "ACGTACGTACGTACGTACGTA" + "G"
    reads = [(seq, "K" * len(seq))]
    table = shard_table.create(256)
    filt = sf.create_filter(256)
    for _ in range(3):
        flat = _flat(reads, k)
        one = jnp.ones_like(flat["left"])
        table, filt = sf.insert_batch_qf(
            table, filt, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], one, flat["valid"],
        )
    got = _fin_dict(table, k)
    assert len(got) == 1
    (cnt, l, r) = next(iter(got.values()))
    assert cnt == 3  # 1 replayed from the filter + 2 direct


def test_qf_pipeline_end_to_end(tmp_path):
    from mhm2_kmer_analysis_v2_tpu.config import Options
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

    k = 21
    reads = genome_reads(100, 70, genome_len=400, seed=41, err=0.01)
    fq = tmp_path / "s.fastq"
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    base = dict(unpaired_fnames=[str(fq) + ":"], kmer_lens=[k],
                batch_reads=64, adapter_trim=False)
    r_plain = run_pipeline(Options(output_dir=str(tmp_path / "o1"), **base))
    r_qf = run_pipeline(Options(output_dir=str(tmp_path / "o2"), use_qf=True, **base))
    assert r_qf[0].unique_kmers == r_plain[0].unique_kmers
    assert r_qf[0].total_kmer_count_sum == r_plain[0].total_kmer_count_sum


def test_qf_saturated_filter_falls_back_to_main_table():
    """Regression: lanes that find NO free filter slot (filter saturated)
    must take the direct main-table insert, not vanish (previously they were
    dropped from f_active before the fallback mask was computed)."""
    k = 21
    reads = random_reads(30, 60, 60, seed=77)
    flat = _flat(reads, k)
    # dedupe on host so both modes see an identical duplicate-free stream
    hi = np.asarray(flat["canon_hi"], np.uint64)
    lo = np.asarray(flat["canon_lo"], np.uint64)
    valid = np.asarray(flat["valid"])
    key = (hi << np.uint64(32)) | lo
    _, first = np.unique(np.where(valid, key, np.uint64(0)), return_index=True)
    keep = np.zeros(len(key), bool)
    keep[first] = True
    valid = valid & keep
    fv = {kk: jnp.asarray(v) for kk, v in flat.items()}
    fv["valid"] = jnp.asarray(valid)
    one = jnp.ones_like(fv["left"])

    plain = shard_table.create(1 << 13)
    qf = shard_table.create(1 << 13)
    filt = sf.create_filter(48)  # ~1100 distinct kmers >> filter capacity
    for _ in range(2):  # second pass: every kmer seen twice
        plain = shard_table.insert_batch(
            plain, fv["canon_hi"], fv["canon_lo"], fv["left"],
            fv["right"], one, fv["valid"],
        )
        qf, filt = sf.insert_batch_qf(
            qf, filt, fv["canon_hi"], fv["canon_lo"], fv["left"],
            fv["right"], one, fv["valid"],
        )
    exp = _fin_dict(plain, k)
    got = _fin_dict(qf, k)
    assert len(exp) > 250  # the stream really is big vs the 48-slot filter
    assert got == exp


def test_qf_supermer_wire_matches_record_wire():
    """--use-qf over the compressed supermer exchange produces the same
    finalized tables as the per-record exchange (the reference ships
    Supermers for every backend, src/kcount/kmer_dht.cpp:247-250)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs

    k = 21
    n_shards = 4
    reads = genome_reads(96, 70, genome_len=400, seed=77, err=0.01)
    reads += random_reads(24, k + 2, 70, seed=78)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    sharding = NamedSharding(mesh, P("sh"))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    args = tuple(jax.device_put(x, sharding) for x in (b.codes, b.badq, b.lengths))

    outs = {}
    for wire in ("record", "supermer"):
        state = cs.create_sharded_qf(n_shards, 1 << 13, 1 << 12, mesh=mesh)
        step = cs.make_count_step_qf(
            mesh, k=k, exchange_cap=4096, supermers=(wire == "supermer")
        )
        state = step(state, *args)
        assert int(np.sum(np.asarray(state.table.overflow))) == 0
        fin = cs.make_finalize(mesh)(state.table)
        merged = {}
        for shard in range(n_shards):
            one = shard_table.FinalizedShard(*[np.asarray(x)[shard] for x in fin])
            vals, counts, left, right = shard_table.compact_to_host(one)
            for s, c, l, r in zip(shard_table.vals_to_strings(vals, k), counts, left, right):
                merged[s] = (int(c), l, r)
        outs[wire] = merged
    assert outs["supermer"] == outs["record"]
    # and both match the oracle's non-singleton survivors
    assert outs["record"] == oracle_count(reads, k).finalize()


def test_qf_multiword_equivalent_finalized_output():
    """--use-qf for k > 32 (the reference's TCF keys on a hash of the full
    k-mer for any MAX_K): QF-mode MW runs produce the same finalized table
    as plain MW mode."""
    from mhm2_kmer_analysis_v2_tpu.ops import kmer_multiword as mw
    from mhm2_kmer_analysis_v2_tpu.table import shard_table_mw as stmw

    k = 33
    reads = genome_reads(100, 80, genome_len=400, seed=41, err=0.01)
    reads += random_reads(20, k + 2, 80, seed=42)  # singleton noise
    Wn = mw.n_words(k)

    def flat_mw(chunk):
        b = encode_batch([s for s, _ in chunk], [q for _, q in chunk])
        recs = mw.kmer_records_mw(
            jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
            k=k, n_shards=1,
        )
        B, L = b.codes.shape
        return (recs["canon"].reshape(Wn, B * L), recs["left"].reshape(-1),
                recs["right"].reshape(-1), recs["valid"].reshape(-1))

    def fin_dict(table):
        fin = stmw.finalize_mw(table)
        strs, counts, left, right = stmw.compact_to_host_mw(fin, k)
        return {s: (int(c), l, r) for s, c, l, r in zip(strs, counts, left, right)}

    plain = stmw.create(1 << 14, Wn)
    qf = stmw.create(1 << 14, Wn)
    filt = sf.create_filter(1 << 12)
    for chunk in (reads[:40], reads[40:80], reads[80:]):
        words, left, right, valid = flat_mw(chunk)
        one = jnp.ones_like(left)
        plain = stmw.insert_batch_mw(plain, words, left, right, one, valid,
                                     w0_full_range=True)
        qf, filt = sf.insert_batch_qf_mw(qf, filt, words, left, right, one, valid)
    exp = fin_dict(plain)
    got = fin_dict(qf)
    assert got == exp
    assert exp == oracle_count(reads, k).finalize()
    assert int(filt.num_stored) > 0  # singletons actually used the filter


def test_qf_multiword_pipeline_end_to_end(tmp_path):
    """--use-qf -k 33 through the CLI pipeline equals the plain run."""
    from mhm2_kmer_analysis_v2_tpu.config import Options
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

    from util import genome_reads as gr

    reads = gr(120, 80, genome_len=600, seed=47, err=0.01)
    fq = tmp_path / "mwqf.fastq"
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    outs = {}
    for mode in ("plain", "qf"):
        res = run_pipeline(Options(
            unpaired_fnames=[str(fq) + ":"], kmer_lens=[33],
            output_dir=str(tmp_path / mode), use_qf=(mode == "qf"),
            batch_reads=64, adapter_trim=False,
        ))
        outs[mode] = (res[0].unique_kmers, res[0].total_kmer_count_sum)
    assert outs["qf"] == outs["plain"]


def test_qf_jit_matches_eager_under_contention():
    """Guards the while_loop body-jaxpr cache trap: lax.while_loop caches
    traced bodies by (function object, avals), so a body function reused
    across calls replays the FIRST call's closure constants under jit —
    eager/jit divergence that orphaned filter entries (count off by one)
    until _filter_phase.scan_chain made the closures per-call."""
    import jax

    k = 21
    # heavy same-batch duplication + tiny filter = claim contention
    reads = genome_reads(120, 60, genome_len=120, seed=99, err=0.0)
    flat = _flat(reads, k)
    one = jnp.ones_like(flat["left"])

    t0 = shard_table.create(1 << 13)
    f0 = sf.create_filter(1 << 8)
    tj, fj = sf.insert_batch_qf(
        t0, f0, flat["canon_hi"], flat["canon_lo"], flat["left"],
        flat["right"], one, flat["valid"])
    with jax.disable_jit():
        te, fe = sf.insert_batch_qf.__wrapped__(
            t0, f0, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], one, flat["valid"])
    # finalized outputs must agree (slot placement may differ)
    assert _fin_dict(tj, k) == _fin_dict(te, k)
    # and match the oracle exactly
    assert _fin_dict(tj, k) == oracle_count(reads, k).finalize()


def test_qf_high_load_equivalent_finalized_output():
    """high_load=True selects the loaded-tier insert layout inside QF mode;
    results must be identical to the low-load program (same probe schedule,
    same commit rules — shard_table.insert_batch contract)."""
    k = 21
    reads = genome_reads(100, 70, genome_len=400, seed=51, err=0.01)
    reads += random_reads(20, k + 2, 70, seed=52)
    flat = _flat(reads, k)
    one = jnp.ones_like(flat["left"])

    plain = shard_table.create(1 << 13)
    outs = []
    for hl in (False, True):
        qf = shard_table.create(1 << 13)
        filt = sf.create_filter(48)
        for _ in range(2):
            qf, filt = sf.insert_batch_qf(
                qf, filt, flat["canon_hi"], flat["canon_lo"], flat["left"],
                flat["right"], one, flat["valid"], high_load=hl,
            )
        outs.append(_fin_dict(qf, k))
    for _ in range(2):
        plain = shard_table.insert_batch(
            plain, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], one, flat["valid"],
        )
    assert outs[0] == outs[1]
    assert outs[0] == _fin_dict(plain, k)


def test_qf_count_step_record_wire_high_load_takes_effect():
    """Regression for the --use-qf record-wire loaded-tier switch: the
    occupancy-triggered high_load recompile must actually change the insert
    program (the ins closure at count_step.make_count_step_qf forwards
    high_load), and both programs must produce identical finalized output."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs

    k = 21
    n_shards = 2
    reads = genome_reads(96, 70, genome_len=400, seed=61, err=0.01)
    reads += random_reads(24, k + 2, 70, seed=62)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    sharding = NamedSharding(mesh, P("sh"))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    args = tuple(jax.device_put(x, sharding) for x in (b.codes, b.badq, b.lengths))

    outs = {}
    hlos = {}
    for hl in (False, True):
        state = cs.create_sharded_qf(n_shards, 1 << 13, 1 << 12, mesh=mesh)
        step = cs.make_count_step_qf(
            mesh, k=k, exchange_cap=4096, supermers=False, high_load=hl,
        )
        hlos[hl] = step.lower(state, *args).as_text()
        state = step(state, *args)
        assert int(np.sum(np.asarray(state.table.overflow))) == 0
        fin = cs.make_finalize(mesh)(state.table)
        merged = {}
        for shard in range(n_shards):
            one = shard_table.FinalizedShard(*[np.asarray(x)[shard] for x in fin])
            vals, counts, left, right = shard_table.compact_to_host(one)
            for s, c, l, r in zip(shard_table.vals_to_strings(vals, k),
                                  counts, left, right):
                merged[s] = (int(c), l, r)
        outs[hl] = merged
    # the flag must reach the insert kernel (different tier layout => the
    # lowered program differs) ...
    assert hlos[False] != hlos[True]
    # ... while the counting contract stays bit-identical
    assert outs[False] == outs[True]
    assert outs[False] == oracle_count(reads, k).finalize()
