"""End-to-end: run_pipeline on generated FASTQ vs the oracle; CSV + dump."""

import gzip
import os

from mhm2_kmer_analysis_v2_tpu.config import Options, parse_args
from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

from util import genome_reads, oracle_count


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, (seq, quals) in enumerate(reads):
            f.write(f"@r{i}\n{seq}\n+\n{quals}\n")


def test_end_to_end(tmp_path):
    k = 21
    reads = genome_reads(128, 70, genome_len=600, seed=77, err=0.01)
    fq = tmp_path / "sample.fastq"
    _write_fastq(fq, reads)
    out = tmp_path / "out"
    # unpaired group (-u): no trimming/merging, every read gets an "N"
    # placeholder mate like the reference's unpaired path
    # (merge_reads.cpp:364-384)
    options = Options(
        unpaired_fnames=[str(fq) + ":"],
        kmer_lens=[k],
        output_dir=str(out),
        dump_kmers=True,
        batch_reads=64,
        adapter_trim=False,
    )
    results = run_pipeline(options)
    assert len(results) == 1
    res = results[0]
    exp = oracle_count(reads, k).finalize()
    assert res.num_reads == 256  # 128 reads + 128 "N" placeholder mates
    assert res.unique_kmers == len(exp)
    assert res.total_kmer_count_sum == sum(c for c, _, _ in exp.values())

    # CSV contract (src/main.cpp:382-391)
    csv = (out / "proxy_results_summary.csv").read_text().splitlines()
    assert csv[0].startswith("Reads,Unique kmers,Total kmers")
    fields = csv[1].split(",")
    assert int(fields[1]) == len(exp)

    # kmer dump parity (kmers-<k>.txt.gz, src/kcount/kmer_dht.cpp:269-297)
    lines = []
    for fn in os.listdir(out / "per_rank"):
        if fn.startswith(f"kmers-{k}.txt.gz"):
            with gzip.open(out / "per_rank" / fn, "rt") as f:
                lines += [ln.strip() for ln in f]
    got = {}
    for ln in lines:
        kmer, cnt, l, r = ln.split()
        got[kmer] = (int(cnt), l, r)
    assert got == exp


def test_cli_parsing():
    o = parse_args(["-r", "a.fq", "-p", "r1.fq", "r2.fq", "-k", "21", "33",
                    "--dump-kmers", "-o", "outdir"])
    assert o.reads_fnames == ["a.fq"]
    assert o.paired_fnames == ["r1.fq:r2.fq"]
    assert o.kmer_lens == [21, 33]
    assert o.dump_kmers
    assert o.all_read_groups() == [["a.fq"], ["r1.fq", "r2.fq"]]


def test_count_histogram(tmp_path):
    k = 21
    reads = genome_reads(64, 60, genome_len=300, seed=88)
    fq = tmp_path / "s.fastq"
    _write_fastq(fq, reads)
    out = tmp_path / "out"
    options = Options(
        unpaired_fnames=[str(fq) + ":"], kmer_lens=[k], output_dir=str(out),
        batch_reads=64, adapter_trim=False,
    )
    run_pipeline(options)
    hist_lines = (out / f"kmer-histogram-{k}.txt").read_text().splitlines()
    got = {int(a): int(b) for a, b in (ln.split() for ln in hist_lines)}
    exp = {}
    for c, _, _ in oracle_count(reads, k).finalize().values():
        exp[c] = exp.get(c, 0) + 1
    assert got == exp


def test_checkpoint_restart_skips_completed_rounds(tmp_path):
    """--checkpoint + --restart: a second run skips k rounds whose 'Completed
    contig round' marker is in the log, and the --ctg-kmers carryover
    reloaded from uutigs-<k>.fasta reproduces the uninterrupted run."""
    from mhm2_kmer_analysis_v2_tpu.config import Options
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

    reads = genome_reads(120, 80, genome_len=600, seed=91, err=0.0)
    fq = tmp_path / "ck.fastq"
    with open(fq, "w") as f:
        for i, (s, q) in enumerate(reads):
            f.write(f"@r{i}\n{s}\n+\n{q}\n")
    base = dict(unpaired_fnames=[str(fq) + ":"], batch_reads=64,
                adapter_trim=False, ctg_kmers=True)

    # uninterrupted two-round reference run
    r_full = run_pipeline(Options(
        output_dir=str(tmp_path / "full"), kmer_lens=[21, 33], **base))

    # round 1 only with --checkpoint, then restart with both rounds
    out = str(tmp_path / "ck")
    r1 = run_pipeline(Options(
        output_dir=out, kmer_lens=[21], checkpoint=True, **base))
    r2 = run_pipeline(Options(
        output_dir=out, kmer_lens=[21, 33], checkpoint=True, restart=True,
        **base))
    # restart SKIPPED k=21 but still reports it (reconstructed from the
    # round-21-result.json sidecar, so the CSV/log contract covers the full
    # multi-k run), and ran only k=33
    assert [r.k for r in r2] == [21, 33]
    assert r2[0].unique_kmers == r1[0].unique_kmers
    assert r2[0].total_kmer_count_sum == r1[0].total_kmer_count_sum
    assert r2[1].unique_kmers == r_full[1].unique_kmers
    assert r2[1].total_kmer_count_sum == r_full[1].total_kmer_count_sum
    log = open(os.path.join(out, "mhm2.log")).read()
    assert "skipping completed contig round k = 21" in log
    # restart also skipped the merge via the merged-read checkpoint
    assert "Restart: loading merged reads" in log
    # the rewritten CSV keeps one row per round, k=21's row intact
    csv_rows = open(os.path.join(out, "proxy_results_summary.csv")).read().splitlines()
    assert len(csv_rows) == 3  # header + 2 rounds
    assert csv_rows[1].split(",")[1] == str(r1[0].unique_kmers)


def test_table_sizing_and_budget_clamp():
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import (
        clamp_elems_to_budget, table_mem_bytes)

    # 48 B/slot at load factor 0.66 -> ~73 B/elem for k<=32
    b = table_mem_bytes(1_000_000, 21)
    assert 6.0e7 < b < 8.0e7, b
    # multiword keys grow with k
    assert table_mem_bytes(1_000_000, 64) > b
    # clamp inverts the estimate
    budget = 10 * 1024 * 1024
    elems = clamp_elems_to_budget(budget, 21, False)
    assert table_mem_bytes(elems, 21) <= budget
    assert table_mem_bytes(elems + 1024, 21) > budget
