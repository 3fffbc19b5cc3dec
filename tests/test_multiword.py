"""Multi-word k-mers (k > 32): extraction, insert, finalize, pipeline, UTG."""

import numpy as np
import jax.numpy as jnp
import pytest

from mhm2_kmer_analysis_v2_tpu import oracle
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_multiword as mw
from mhm2_kmer_analysis_v2_tpu.table import shard_table_mw as stmw

from util import genome_reads, oracle_count, random_reads


def _records(reads, k, n_shards=1):
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = mw.kmer_records_mw(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=n_shards,
    )
    return batch, recs


@pytest.mark.parametrize("k", [33, 55, 64, 77, 96, 128, 160])
def test_records_vs_oracle(k):
    reads = random_reads(5, k + 2, 2 * k + 20, seed=k)
    n_shards = 5
    batch, recs = _records(reads, k, n_shards)
    canon = np.asarray(recs["canon"])
    valid = np.asarray(recs["valid"])
    left = np.asarray(recs["left"])
    right = np.asarray(recs["right"])
    tgt = np.asarray(recs["target"])
    m = oracle.minimizer_len_for_k(k)
    Wn = mw.n_words(k)
    r = k - 16 * (Wn - 1)

    for b, (seq, quals) in enumerate(reads):
        L = len(seq)
        good = [ord(q) >= 33 + 20 for q in quals]
        up = seq.upper()
        for i in range(batch.max_len):
            expect_valid = 1 <= i <= L - k - 1
            assert bool(valid[b, i]) == expect_valid
            if not expect_valid:
                continue
            v = oracle.kmer_to_val(up[i : i + k])
            cv, flipped = oracle.canonical_val(v, k)
            # decode words back to the value
            got = 0
            for j, width in enumerate([r] + [16] * (Wn - 1)):
                got = (got << (2 * width)) | int(canon[j, b, i])
            assert got == cv, (b, i)
            l = up[i - 1] if good[i - 1] else "0"
            rr = up[i + k] if good[i + k] else "0"
            if flipped:
                l, rr = oracle._COMP[rr], oracle._COMP[l]
            if l in "ACGT":
                assert left[b, i] == oracle._CODE[l]
            else:
                assert left[b, i] >= 4
            if rr in "ACGT":
                assert right[b, i] == oracle._CODE[rr]
            else:
                assert right[b, i] >= 4
            assert int(tgt[b, i]) == oracle.kmer_target_shard(cv, k, n_shards, m)


@pytest.mark.parametrize("k", [33, 55, 128, 160])
def test_insert_finalize_vs_oracle(k):
    reads = genome_reads(60, k + 40, genome_len=400, seed=k, err=0.01)
    batch, recs = _records(reads, k)
    Wn = mw.n_words(k)
    words = recs["canon"].reshape(Wn, -1)
    table = stmw.create(1 << 14, Wn)
    table = stmw.insert_batch_mw(
        table, words, recs["left"].reshape(-1), recs["right"].reshape(-1),
        jnp.ones_like(recs["left"].reshape(-1)), recs["valid"].reshape(-1),
    )
    assert int(table.num_dropped) == 0
    fin = stmw.finalize_mw(table, dmin_thres=2)
    strings, counts, left, right = stmw.compact_to_host_mw(fin, k)
    got = {s: (int(c), l, r) for s, c, l, r in zip(strings, counts, left, right)}
    exp = oracle_count(reads, k).finalize()
    assert got == exp


def test_mw_pipeline_end_to_end(tmp_path):
    from mhm2_kmer_analysis_v2_tpu.config import Options
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

    k = 33
    reads = genome_reads(100, 80, genome_len=400, seed=3)
    fq = tmp_path / "s.fastq"
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    out = tmp_path / "out"
    options = Options(
        unpaired_fnames=[str(fq) + ":"], kmer_lens=[k], output_dir=str(out),
        dump_kmers=True, batch_reads=64, adapter_trim=False,
    )
    results = run_pipeline(options)
    exp = oracle_count(reads, k).finalize()
    assert results[0].unique_kmers == len(exp)
    assert results[0].total_kmer_count_sum == sum(c for c, _, _ in exp.values())
    # uutig dump exists and covers the graph
    assert (out / f"uutigs-{k}.fasta").exists()
    oc = oracle_count(reads, k)
    fasta = (out / f"uutigs-{k}.fasta").read_text().splitlines()
    contigs = {fasta[i + 1] for i in range(0, len(fasta), 2)}
    canon = {min(s, oracle.revcomp_str(s)) for s in contigs}
    assert canon == oc.utgs()


@pytest.mark.parametrize("k", [33, 160])
def test_mw_sharded_invariance(k):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs

    reads = genome_reads(64, max(80, k + 12), genome_len=400, seed=9)
    results = {}
    for n_shards in (1, 4):
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
        rows = -(-len(reads) // n_shards) * n_shards
        b = encode_batch([s for s, _ in reads], [q for _, q in reads], pad_to=rows)
        state = cs.create_sharded_mw(n_shards, 1 << 13, k, mesh=mesh)
        step = cs.make_count_step_mw(mesh, k=k, exchange_cap=rows * b.codes.shape[1])
        sharding = NamedSharding(mesh, P("sh"))
        state = step(
            state,
            jax.device_put(b.codes, sharding),
            jax.device_put(b.badq, sharding),
            jax.device_put(b.lengths, sharding),
        )
        fin = cs.make_finalize_mw(mesh)(state)
        merged = {}
        for shard in range(n_shards):
            one = stmw.FinalizedMW(*[np.asarray(x)[shard] for x in fin])
            s, c, l, r = stmw.compact_to_host_mw(one, k)
            for ss, cc, ll, rr in zip(s, c, l, r):
                assert ss not in merged
                merged[ss] = (int(cc), ll, rr)
        results[n_shards] = merged
    assert results[1] == results[4]


def test_mw_supermer_wire_matches_record_wire():
    """k > 32 over the compressed supermer exchange produces the same
    finalized tables as the per-record word exchange."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs
    from mhm2_kmer_analysis_v2_tpu.table import shard_table_mw as stmw

    from util import genome_reads, oracle_count

    k = 33
    n_shards = 4
    reads = genome_reads(96, 80, genome_len=400, seed=55, err=0.01)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    sharding = NamedSharding(mesh, P("sh"))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    args = tuple(jax.device_put(x, sharding) for x in (b.codes, b.badq, b.lengths))

    outs = {}
    for wire in ("record", "supermer"):
        state = cs.create_sharded_mw(n_shards, 1 << 13, k, mesh=mesh)
        step = cs.make_count_step_mw(
            mesh, k=k, exchange_cap=4096, supermers=(wire == "supermer")
        )
        state = step(state, *args)
        assert int(np.sum(np.asarray(state.overflow))) == 0
        fin = cs.make_finalize_mw(mesh)(state)
        merged = {}
        for shard in range(n_shards):
            one = stmw.FinalizedMW(*[np.asarray(x)[shard] for x in fin])
            strs, counts, left, right = stmw.compact_to_host_mw(one, k)
            for s, c, l, r in zip(strs, counts, left, right):
                merged[s] = (int(c), l, r)
        outs[wire] = merged
    assert outs["supermer"] == outs["record"]
    assert outs["record"] == oracle_count(reads, k).finalize()


@pytest.mark.parametrize("k", [33, 64, 96, 128, 160])
def test_route_kmer_words_matches_count_step(k):
    """Standalone multi-word k-mer routing (queries/traversal) places k-mers
    exactly where kmer_records_mw's count-step targets do."""
    rng = np.random.default_rng(k)
    S = 7
    B, L = 4, k + 40
    codes = rng.integers(0, 4, (B, L)).astype(np.int32)
    rec = mw.kmer_records_mw(
        jnp.asarray(codes), jnp.zeros((B, L), bool),
        jnp.full((B,), L, jnp.int32), k=k, n_shards=S,
    )
    valid = np.asarray(rec["valid"])
    canon = np.asarray(rec["canon"])
    want = np.asarray(rec["target"])[valid]
    planes = [jnp.asarray(canon[j][valid]) for j in range(mw.n_words(k))]
    got = np.asarray(mw.route_kmer_words(planes, k, S))
    assert (got == want).all(), k
