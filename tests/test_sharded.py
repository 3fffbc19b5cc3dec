"""Multi-device sharded counting: all_to_all routing on a virtual CPU mesh.

Checks the key invariant the reference guarantees (SURVEY §4): the merged
multiset of (kmer, count, L, R) is independent of the number of shards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs
from mhm2_kmer_analysis_v2_tpu.table import shard_table

from util import genome_reads, oracle_count


def _run_sharded(reads, k, n_shards, max_elems=1 << 13, batches=1):
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    rows = -(-len(reads) // (n_shards * batches)) * n_shards
    state = cs.create_sharded(n_shards, max_elems, mesh=mesh)
    max_len = max(len(s) for s, _ in reads)
    exchange_cap = rows * max_len  # generous for tests
    step = cs.make_count_step(mesh, k=k, exchange_cap=exchange_cap)
    sharding = NamedSharding(mesh, P("sh"))
    for i in range(batches):
        chunk = reads[i::batches]
        b = encode_batch(
            [s for s, _ in chunk], [q for _, q in chunk],
            max_len=max_len, pad_to=rows,
        )
        state = step(
            state,
            jax.device_put(b.codes, sharding),
            jax.device_put(b.badq, sharding),
            jax.device_put(b.lengths, sharding),
        )
    finalize = cs.make_finalize(mesh, dmin_thres=2)
    fin = finalize(state)
    return state, fin


def _merged(fin, k, n_shards):
    out = {}
    for shard in range(n_shards):
        one = shard_table.FinalizedShard(*[np.asarray(x)[shard] for x in fin])
        vals, counts, left, right = shard_table.compact_to_host(one)
        for s, c, l, r in zip(shard_table.vals_to_strings(vals, k), counts, left, right):
            assert s not in out, "kmer appeared in two shards"
            out[s] = (int(c), l, r)
    return out


@pytest.mark.parametrize("n_shards", [1, 2, 8])
def test_sharded_matches_oracle(n_shards):
    k = 21
    reads = genome_reads(64, 60, genome_len=300, seed=21)
    state, fin = _run_sharded(reads, k, n_shards)
    assert int(np.sum(np.asarray(state.overflow))) == 0
    assert int(np.sum(np.asarray(state.num_dropped))) == 0
    got = _merged(fin, k, n_shards)
    exp = oracle_count(reads, k).finalize()
    assert got == exp


def test_shard_count_invariance():
    k = 21
    reads = genome_reads(96, 70, genome_len=500, seed=33, err=0.01)
    results = {}
    for n in (1, 2, 8):
        _, fin = _run_sharded(reads, k, n)
        results[n] = _merged(fin, k, n)
    assert results[1] == results[2] == results[8]


def test_multi_batch_sharded():
    k = 21
    reads = genome_reads(64, 60, genome_len=300, seed=44)
    _, fin1 = _run_sharded(reads, k, 4, batches=1)
    _, fin4 = _run_sharded(reads, k, 4, batches=4)
    assert _merged(fin1, k, 4) == _merged(fin4, k, 4)


def _step_once(reads, k, n_shards, exchange_cap, max_rounds=0, step_factory=None):
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    state = cs.create_sharded(n_shards, 1 << 13, mesh=mesh)
    factory = step_factory or cs.make_count_step
    step = factory(mesh, k=k, exchange_cap=exchange_cap, max_rounds=max_rounds)
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    sharding = NamedSharding(mesh, P("sh"))
    state = step(
        state,
        jax.device_put(b.codes, sharding),
        jax.device_put(b.badq, sharding),
        jax.device_put(b.lengths, sharding),
    )
    fin = cs.make_finalize(mesh)(state)
    return state, fin


def test_spill_rounds_lossless_under_tiny_cap():
    """Exchange capacity far below the record count: spill rounds drain every
    destination queue with zero loss (ThreeTierAggrStore's no-drop contract,
    kmer_dht.cpp:247-258)."""
    k = 21
    reads = genome_reads(32, 60, genome_len=300, seed=55)
    state, fin = _step_once(reads, k, 2, exchange_cap=8)  # absurdly small
    assert int(np.sum(np.asarray(state.overflow))) == 0
    assert int(np.max(np.asarray(state.spill_rounds))) > 10
    exp = oracle_count(reads, k).finalize()
    assert _merged(fin, k, 2) == exp


def test_spill_rounds_adversarial_skew():
    """Every k-mer routed to ONE owner (single repeated homopolymer k-mer)
    with a tiny cap: counts stay exact."""
    k = 21
    seq = "A" * 80
    quals = "K" * 80
    reads = [(seq, quals)] * 16
    state, fin = _step_once(reads, k, 4, exchange_cap=16)
    assert int(np.sum(np.asarray(state.overflow))) == 0
    assert int(np.max(np.asarray(state.spill_rounds))) > 0
    exp = oracle_count(reads, k).finalize()
    assert _merged(fin, k, 4) == exp
    # really is one kmer, all on one shard
    kept = np.asarray(fin.num_kept)
    assert kept.sum() == 1


def test_max_rounds_caps_spill_and_counts_loss():
    """--max-rpcs-in-flight analogue: capping the rounds drops the excess and
    reports it in overflow (the only lossy path, and it is explicit)."""
    k = 21
    reads = genome_reads(32, 60, genome_len=300, seed=55)
    state, _ = _step_once(reads, k, 2, exchange_cap=8, max_rounds=2)
    assert int(np.sum(np.asarray(state.overflow))) > 0
    assert int(np.max(np.asarray(state.spill_rounds))) == 1


def test_supermer_spill_rounds_lossless():
    """The supermer wire spills losslessly too (per-round window compaction)."""
    k = 21
    reads = genome_reads(48, 70, genome_len=400, seed=66, err=0.01)
    state, fin = _step_once(
        reads, k, 2, exchange_cap=8, step_factory=cs.make_count_step_supermer,
    )
    assert int(np.sum(np.asarray(state.overflow))) == 0
    assert int(np.max(np.asarray(state.spill_rounds))) > 0
    exp = oracle_count(reads, k).finalize()
    assert _merged(fin, k, 2) == exp


def test_packed_step_equals_unpacked():
    """Bit-packed h2d input path produces identical tables."""
    from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch

    k = 21
    reads = genome_reads(64, 60, genome_len=300, seed=77, err=0.02)
    # add some N and low-quality content
    reads = [(s[:10] + "N" + s[11:], q) for s, q in reads]
    mesh = Mesh(np.array(jax.devices()[:4]), ("sh",))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    sharding = NamedSharding(mesh, P("sh"))

    s1 = cs.create_sharded(4, 1 << 13, mesh=mesh)
    step1 = cs.make_count_step(mesh, k=k, exchange_cap=b.codes.size)
    s1 = step1(s1, jax.device_put(b.codes, sharding),
               jax.device_put(b.badq, sharding), jax.device_put(b.lengths, sharding))

    s2 = cs.create_sharded(4, 1 << 13, mesh=mesh)
    step2 = cs.make_packed_count_step(
        mesh, k=k, exchange_cap=b.codes.size, max_len=b.max_len)
    pb = b.pack()
    s2 = step2(s2, jax.device_put(pb.code2, sharding),
               jax.device_put(pb.nmask, sharding),
               jax.device_put(pb.badq, sharding),
               jax.device_put(pb.lengths, sharding))

    fin1 = cs.make_finalize(mesh)(s1)
    fin2 = cs.make_finalize(mesh)(s2)
    assert _merged(fin1, k, 4) == _merged(fin2, k, 4)


def test_supermer_exchange_equals_record_exchange():
    """Supermer-compressed exchange produces bit-identical tables to the
    per-k-mer-record exchange (owner-side recompute parity)."""
    k = 21
    reads = genome_reads(96, 80, genome_len=500, seed=91, err=0.02)
    # add N + low-quality content to exercise the ext-invalid bitmask
    reads = [(s[:15] + "N" + s[16:], q[:30] + "#" + q[31:]) for s, q in reads]
    n_shards = 4
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    sharding = NamedSharding(mesh, P("sh"))
    args = (
        jax.device_put(b.codes, sharding),
        jax.device_put(b.badq, sharding),
        jax.device_put(b.lengths, sharding),
    )

    s1 = cs.create_sharded(n_shards, 1 << 13, mesh=mesh)
    step1 = cs.make_count_step(mesh, k=k, exchange_cap=b.codes.size)
    s1 = step1(s1, *args)

    s2 = cs.create_sharded(n_shards, 1 << 13, mesh=mesh)
    step2 = cs.make_count_step_supermer(mesh, k=k, exchange_cap=2048)
    s2 = step2(s2, *args)
    assert int(np.sum(np.asarray(s2.overflow))) == 0

    fin1 = cs.make_finalize(mesh)(s1)
    fin2 = cs.make_finalize(mesh)(s2)
    assert _merged(fin1, k, n_shards) == _merged(fin2, k, n_shards)

    # and both equal the oracle
    exp = oracle_count(reads, k).finalize()
    assert _merged(fin2, k, n_shards) == exp


def test_supermer_forced_splits():
    """max_run=3 forces many window splits; results stay identical (the
    halo-overlap convention holds across forced boundaries)."""
    k = 21
    reads = genome_reads(64, 90, genome_len=400, seed=101)
    n_shards = 2  # few shards -> long same-owner runs -> many forced splits
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    sharding = NamedSharding(mesh, P("sh"))
    args = (
        jax.device_put(b.codes, sharding),
        jax.device_put(b.badq, sharding),
        jax.device_put(b.lengths, sharding),
    )
    s1 = cs.create_sharded(n_shards, 1 << 13, mesh=mesh)
    s1 = cs.make_count_step(mesh, k=k, exchange_cap=b.codes.size)(s1, *args)
    s2 = cs.create_sharded(n_shards, 1 << 13, mesh=mesh)
    s2 = cs.make_count_step_supermer(mesh, k=k, exchange_cap=4096, max_run=3)(s2, *args)
    assert int(np.sum(np.asarray(s2.overflow))) == 0
    fin1 = cs.make_finalize(mesh)(s1)
    fin2 = cs.make_finalize(mesh)(s2)
    assert _merged(fin1, k, n_shards) == _merged(fin2, k, n_shards)


def test_pipeline_wire_flag_equivalence(tmp_path):
    """--wire supermer and --wire record produce identical results through
    the full pipeline (the auto default picks by process count)."""
    from mhm2_kmer_analysis_v2_tpu.config import Options
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

    reads = genome_reads(96, 70, genome_len=400, seed=13, err=0.01)
    fq = tmp_path / "w.fastq"
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    base = dict(unpaired_fnames=[str(fq) + ":"], kmer_lens=[21],
                batch_reads=64, adapter_trim=False)
    r_sm = run_pipeline(Options(output_dir=str(tmp_path / "sm"), wire="supermer", **base))
    r_rec = run_pipeline(Options(output_dir=str(tmp_path / "rec"), wire="record", **base))
    assert r_sm[0].unique_kmers == r_rec[0].unique_kmers
    assert r_sm[0].total_kmer_count_sum == r_rec[0].total_kmer_count_sum


def test_hlo_collective_bytes_matches_formula():
    """The compiled count step's all_to_all shapes (parsed from HLO) must
    agree with the formula bookkeeping in pipeline/analysis.py — a regression
    that changes the exchange wire shape shows up here."""
    from mhm2_kmer_analysis_v2_tpu.utils.comm_stats import hlo_collective_bytes

    n_shards, k, cap, rows, max_len = 8, 21, 256, 8, 64
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    state = cs.create_sharded(n_shards, 1 << 10, mesh=mesh)
    step = cs.make_count_step(mesh, k=k, exchange_cap=cap)
    sharding = NamedSharding(mesh, P("sh"))
    b = encode_batch(["A" * max_len] * rows, ["I" * max_len] * rows,
                     max_len=max_len, pad_to=rows)
    args = (
        jax.device_put(b.codes, sharding),
        jax.device_put(b.badq, sharding),
        jax.device_put(b.lengths, sharding),
    )
    sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        (state,) + args,
    )
    txt = step.lower(*sds).compile().as_text()
    per = hlo_collective_bytes(txt)
    a2a = {op: v for op, v in per.items() if op.startswith("all-to-all")}
    assert a2a, f"no all-to-all in compiled HLO: {sorted(per)}"
    (calls, nbytes), = a2a.values()
    # one static instance (inside the spill-round loop); per-device buffer is
    # [n_shards, 3 planes, cap] u32 -> formula bytes / n_shards devices
    formula_global = 3 * n_shards * n_shards * cap * 4
    assert calls == 1
    assert nbytes == formula_global // n_shards, (nbytes, formula_global)
