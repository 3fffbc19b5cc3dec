"""Auxiliary subsystems: restart/checkpoint, point queries, log parser,
memory tracker, comm stats."""

import gzip
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from mhm2_kmer_analysis_v2_tpu.config import Options, parse_args
from mhm2_kmer_analysis_v2_tpu.io.ingest import get_merged_reads_fname, load_and_merge_reads
from mhm2_kmer_analysis_v2_tpu.io.merge_reads import revcomp
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops
from mhm2_kmer_analysis_v2_tpu.table import query, shard_table

from util import genome_reads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), n))


def test_dump_merged_and_restart(tmp_path):
    g = _mk_genome(150, seed=1)
    fq = tmp_path / "il.fastq"
    with open(fq, "w") as f:
        for i in range(5):
            f.write(f"@p{i}/1\n{g[:100]}\n+\n{'K' * 100}\n")
            f.write(f"@p{i}/2\n{revcomp(g[50:150])}\n+\n{'K' * 100}\n")
    out = tmp_path / "out"
    out.mkdir()
    options = Options(
        reads_fnames=[str(fq)], kmer_lens=[21], output_dir=str(out),
        dump_merged=True, adapter_trim=False,
    )
    pr1, stats1 = load_and_merge_reads(options)
    assert stats1.num_merged == 5
    ckpt = get_merged_reads_fname(str(fq), str(out))
    assert os.path.exists(ckpt)
    with gzip.open(ckpt, "rt") as f:
        assert f.readline().startswith("@r0/1")

    # restart: merged checkpoint is loaded, no re-merge
    options.restart = True
    pr2, stats2 = load_and_merge_reads(options)
    assert stats2.num_pairs == 0  # merge skipped
    assert pr2.seqs == pr1.seqs
    assert pr2.quals == pr1.quals


def test_restart_cli_loads_config(tmp_path):
    out = tmp_path / "out"
    (out / "per_rank").mkdir(parents=True)
    options = Options(reads_fnames=["x.fq"], kmer_lens=[33], output_dir=str(out))
    options.write_config_file()
    o2 = parse_args(["--restart", "-o", str(out)])
    assert o2.kmer_lens == [33]
    assert o2.reads_fnames == ["x.fq"]
    assert o2.restart


def test_point_queries():
    k = 21
    reads = genome_reads(60, 60, genome_len=300, seed=5)
    batch = encode_batch([s for s, _ in reads], [q for _, q in reads])
    recs = kmer_ops.kmer_records(
        jnp.asarray(batch.codes), jnp.asarray(batch.badq),
        jnp.asarray(batch.lengths), k=k, n_shards=1,
    )
    table = shard_table.create(1 << 14)
    flat = {kk: v.reshape(-1) for kk, v in recs.items()}
    table = shard_table.insert_batch(
        table, flat["canon_hi"], flat["canon_lo"], flat["left"], flat["right"],
        jnp.ones_like(flat["left"]), flat["valid"],
    )
    from util import oracle_count

    oc = oracle_count(reads, k)
    from mhm2_kmer_analysis_v2_tpu.oracle import val_to_kmer

    some = sorted(oc.table)[:20]
    kmers = [val_to_kmer(v, k) for v in some]
    got = query.get_kmer_counts(table, kmers + ["A" * k], k)
    for kmer_v, c in zip(some, got[:20]):
        assert c == oc.table[kmer_v].count
    assert got[20] == 0  # absent kmer (poly-A never counted here)


def test_log_parser(tmp_path):
    log = tmp_path / "mhm2.log"
    log.write_text(
        "   1.0 tot_num_reads: 500\n"
        "   2.0 Total kmers: 1234\n"
        "   2.1 Total kmer count sum: 9999\n"
        "   3.0 Peak memory: 1.25 GB\n"
        "      analyze_kmers                  5.00 s ( 90.0 %)\n"
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parse_run_log.py"), str(log)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    assert "1234" in r.stdout
    assert "analyze_kmers" in r.stdout


def test_memory_tracker():
    from mhm2_kmer_analysis_v2_tpu.utils.memory import MemoryTracker

    t = MemoryTracker(interval_s=0.01)
    t.start()
    peak = t.stop()
    assert peak > 0


def test_comm_stats_report():
    from mhm2_kmer_analysis_v2_tpu.utils.comm_stats import CommStats

    cs = CommStats()
    cs.begin_stage("s1")
    cs.add_h2d(1 << 20)
    cs.add_collective(1 << 21, 3)
    cs.end_stage()
    rep = cs.report()
    assert "s1" in rep and "1.0MB" in rep and "3 calls" in rep


def test_point_queries_sharded():
    """Routed queries find every kmer on its owner shard (KmerDHT RPC analogue)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs
    from mhm2_kmer_analysis_v2_tpu.oracle import val_to_kmer

    k = 21
    n_shards = 4
    reads = genome_reads(48, 60, genome_len=250, seed=15)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    state = cs.create_sharded(n_shards, 1 << 13, mesh=mesh)
    step = cs.make_count_step(mesh, k=k, exchange_cap=b.codes.size)
    sharding = NamedSharding(mesh, P("sh"))
    state = step(state, jax.device_put(b.codes, sharding),
                 jax.device_put(b.badq, sharding), jax.device_put(b.lengths, sharding))

    from util import oracle_count as _oc

    oc = _oc(reads, k)
    some = sorted(oc.table)[:30]
    kmers = [val_to_kmer(v, k) for v in some] + ["C" * k]
    got = query.get_kmer_counts_sharded(state, kmers, k, n_shards)
    for v, c in zip(some, got[:30]):
        assert c == oc.table[v].count
    assert got[30] == 0


def test_affinity_cpulist_parse_and_pin_restore():
    """--pin analogue (set_process_affinity, src/main.cpp:92-104): cpu mode
    restricts the mask to this rank's even share; none is a no-op."""
    import os

    from mhm2_kmer_analysis_v2_tpu.utils.affinity import (
        _core_groups, _numa_domains, _parse_cpulist, set_process_affinity)

    assert _parse_cpulist("0-3,8,10-11") == [0, 1, 2, 3, 8, 10, 11]
    assert _parse_cpulist("5") == [5]
    assert _parse_cpulist("") == []

    domains = _numa_domains()
    assert domains and all(d for d in domains)
    avail = sorted(os.sched_getaffinity(0))
    groups = _core_groups(avail)
    assert sorted(c for g in groups for c in g) == avail

    before = os.sched_getaffinity(0)
    try:
        set_process_affinity("none")
        assert os.sched_getaffinity(0) == before
        # single process on the host: never restrict (the lone feeder would
        # lose CPUs for nothing)
        set_process_affinity("cpu", rank=0, local_n=1)
        assert os.sched_getaffinity(0) == before
        # typo'd MHM2_PIN default: log, don't crash or restrict
        set_process_affinity("numa_rr", rank=0, local_n=2)
        assert os.sched_getaffinity(0) == before
        if len(avail) >= 2:
            set_process_affinity("cpu", rank=0, local_n=2)
            got = sorted(os.sched_getaffinity(0))
            assert got == avail[: len(avail) // 2]
    finally:
        os.sched_setaffinity(0, before)


def test_cli_pin_and_optimize_flags():
    import pytest

    from mhm2_kmer_analysis_v2_tpu.config import parse_args

    o = parse_args(["-r", "x.fastq", "--pin", "none",
                    "--optimize", "contiguity", "--max-worker-threads", "2"])
    assert o.pin_by == "none"
    assert o.optimize_for == "contiguity"
    assert o.max_worker_threads == 2
    # an invalid MHM2_PIN env default must be rejected like a CLI typo
    import os as _os

    _os.environ["MHM2_PIN"] = "numa_rr"
    try:
        with pytest.raises(SystemExit):
            parse_args(["-r", "x.fastq"])
    finally:
        del _os.environ["MHM2_PIN"]


def test_point_queries_sharded_multiword():
    """Routed point queries for k > 32 (MW tables): the KmerDHT RPC get
    analogue must work for every MAX_K like the reference's template."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs
    from mhm2_kmer_analysis_v2_tpu.oracle import val_to_kmer

    k = 33
    n_shards = 4
    reads = genome_reads(48, 70, genome_len=300, seed=19)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    state = cs.create_sharded_mw(n_shards, 1 << 13, k, mesh=mesh)
    step = cs.make_count_step_mw(mesh, k=k, exchange_cap=b.codes.size)
    sharding = NamedSharding(mesh, P("sh"))
    state = step(state, jax.device_put(b.codes, sharding),
                 jax.device_put(b.badq, sharding), jax.device_put(b.lengths, sharding))

    from util import oracle_count as _oc

    oc = _oc(reads, k)
    some = sorted(oc.table)[:30]
    kmers = [val_to_kmer(v, k) for v in some] + ["C" * k]
    got = query.get_kmer_counts_sharded(state, kmers, k, n_shards)
    for v, c in zip(some, got[:30]):
        assert c == oc.table[v].count
    assert got[30] == 0


def test_kmer_dht_facade_all_modes():
    """models.KmerDHT — the KmerDHT<MAX_K> API analogue
    (src/kcount/kmer_dht.hpp:118-182): construct, add reads, finalize,
    query, iterate — for every table family on a 4-shard mesh."""
    import jax
    from jax.sharding import Mesh

    from mhm2_kmer_analysis_v2_tpu.models import KmerDHT
    from util import oracle_count as _oc

    mesh = Mesh(np.array(jax.devices()[:4]), ("sh",))
    reads = genome_reads(64, 70, genome_len=300, seed=23)
    for k, use_qf, wire in ((21, False, "record"), (21, True, "supermer"),
                            (33, False, "supermer"), (33, True, "record")):
        dht = KmerDHT(mesh, k, 1 << 13, use_qf=use_qf,
                      filter_elems_per_shard=1 << 11, wire=wire)
        dht.add_read_strings([s for s, _ in reads], [q for _, q in reads])
        exp = _oc(reads, k).finalize()
        assert dht.get_num_kmers() == len(exp), (k, use_qf, wire)
        got = {s: (int(c), l, r) for s, c, l, r in dht.items()}
        assert got == exp, (k, use_qf, wire)
        some = sorted(exp)[:10]
        assert dht.get_kmer_counts(some) == [exp[s][0] for s in some]
        assert not dht.kmer_exists("A" * k) or ("A" * k) in exp
        assert 0 <= dht.get_kmer_target_rank(some[0]) < 4
