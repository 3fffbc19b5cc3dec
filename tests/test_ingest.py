"""Ingest stage: pairing robustness, merge wiring, end-to-end merged counting."""

import numpy as np

from mhm2_kmer_analysis_v2_tpu.config import Options
from mhm2_kmer_analysis_v2_tpu.io.adapters import Adapters
from mhm2_kmer_analysis_v2_tpu.io.ingest import ingest_group, load_and_merge_reads
from mhm2_kmer_analysis_v2_tpu.io.merge_reads import MergeStats, revcomp
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import PackedReads
from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import run_pipeline

from util import oracle_count


def _mk_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), n))


def _write_interleaved(path, pairs):
    with open(path, "w") as f:
        for i, (r1, r2) in enumerate(pairs):
            f.write(f"@p{i}/1\n{r1}\n+\n{'K' * len(r1)}\n")
            f.write(f"@p{i}/2\n{r2}\n+\n{'K' * len(r2)}\n")


def test_ingest_merges_overlapping_pairs(tmp_path):
    g = _mk_genome(150, seed=1)
    pairs = [(g[:100], revcomp(g[50:150])) for _ in range(4)]
    fq = tmp_path / "il.fastq"
    _write_interleaved(fq, pairs)
    pr = PackedReads()
    stats = MergeStats()
    ingest_group([str(fq)], pr, Adapters(), stats=stats)
    assert stats.num_merged == 4
    # merged read + N placeholder per pair
    assert len(pr) == 8
    assert pr.seqs[0] == g
    assert pr.seqs[1] == "N"


def test_ingest_missing_mate_resync(tmp_path):
    g = _mk_genome(300, seed=2)
    fq = tmp_path / "il.fastq"
    with open(fq, "w") as f:
        f.write(f"@p0/1\n{g[:80]}\n+\n{'K' * 80}\n")
        f.write(f"@p0/2\n{g[200:280]}\n+\n{'K' * 80}\n")
        # p1 has no /2 mate
        f.write(f"@p1/1\n{g[80:160]}\n+\n{'K' * 80}\n")
        f.write(f"@p2/1\n{g[100:180]}\n+\n{'K' * 80}\n")
        f.write(f"@p2/2\n{g[10:90]}\n+\n{'K' * 80}\n")
    pr = PackedReads()
    ingest_group([str(fq)], pr, Adapters())
    # 3 pairs worth of entries (p1 gets a fake N mate)
    assert len(pr) == 6
    assert pr.seqs[2] == g[80:160]
    assert pr.seqs[3] == "N"
    assert pr.seqs[4] == g[100:180]


def test_merged_pipeline_counts_match_oracle(tmp_path):
    """End-to-end with real merging: the oracle is fed the POST-merge reads
    (merge changes the counted k-mer multiset — that is its purpose)."""
    k = 21
    rng = np.random.default_rng(3)
    g = _mk_genome(500, seed=3)
    pairs = []
    for _ in range(40):
        pos = int(rng.integers(0, 500 - 150))
        frag = g[pos : pos + 150]
        pairs.append((frag[:100], revcomp(frag[50:])))
    fq = tmp_path / "il.fastq"
    _write_interleaved(fq, pairs)

    out = tmp_path / "out"
    options = Options(
        reads_fnames=[str(fq)],
        kmer_lens=[k],
        output_dir=str(out),
        batch_reads=32,
        adapter_trim=False,
    )
    results = run_pipeline(options)
    res = results[0]

    # oracle over the merged fragments (placeholder mates yield no k-mers)
    oc_reads = []
    for r1, r2 in pairs:
        # each pair overlaps perfectly -> merges into the 150bp fragment
        frag_start = g.find(r1)
        oc_reads.append((g[frag_start : frag_start + 150], "K" * 150))
    exp = oracle_count(oc_reads, k).finalize()
    assert res.unique_kmers == len(exp)
    assert res.total_kmer_count_sum == sum(c for c, _, _ in exp.values())


def test_load_and_merge_reads_options(tmp_path):
    g = _mk_genome(150, seed=4)
    pairs = [(g[:100], revcomp(g[50:150]))]
    fq = tmp_path / "il.fastq"
    _write_interleaved(fq, pairs)
    options = Options(reads_fnames=[str(fq)], kmer_lens=[21])
    pr, stats = load_and_merge_reads(options)
    assert stats.num_merged == 1
    assert len(pr) == 2


def test_add_batch_matches_add_read():
    """Bulk add_batch must be byte-equivalent to sequential add_read for
    mixed-length reads including N/IUPAC bases."""
    rng = np.random.default_rng(11)
    names, seqs, quals = [], [], []
    for i in range(257):  # non-power-of-2, mixed lengths
        ln = int(rng.integers(1, 120))
        seq = "".join(rng.choice(list("ACGTNRY"), ln))
        q = "".join(chr(int(c)) for c in rng.integers(33, 74, ln))
        names.append(f"r{i}/1")
        seqs.append(seq)
        quals.append(q)

    a = PackedReads()
    for n, s, q in zip(names, seqs, quals):
        a.add_read(n, s, q)
    b = PackedReads()
    b.add_batch(names[:100], seqs[:100], quals[:100])
    b.add_batch([], [], [])  # empty batch is a no-op
    b.add_batch(names[100:], seqs[100:], quals[100:])

    assert len(a) == len(b) == 257
    assert a._offsets == b._offsets
    assert a.names == b.names
    assert a.bases == b.bases
    assert a.max_read_len == b.max_read_len
    assert np.array_equal(a._codes.view(), b._codes.view())
    assert np.array_equal(a._quals.view(), b._quals.view())
    for i in (0, 5, 256):
        assert a.get_read(i) == b.get_read(i)


def test_add_batch_rejects_illegal_base():
    import pytest

    pr = PackedReads()
    with pytest.raises(ValueError, match="bad/1"):
        pr.add_batch(["ok/1", "bad/1"], ["ACGT", "AC!T"], ["IIII", "IIII"])


def test_add_batch_rejects_per_read_length_mismatch():
    """COMPENSATING mismatches (equal chunk totals) must still be rejected —
    they would silently shift every later read's quality bytes."""
    import pytest

    pr = PackedReads()
    with pytest.raises(ValueError, match="short/1"):
        pr.add_batch(
            ["short/1", "long/1"],
            ["AC", "ACGT"],
            ["IIII", "II"],  # totals match (6 == 6), per-read lengths do not
        )
    assert len(pr) == 0


def test_prefetched_consumer_abort_stops_feed_thread():
    """An exception in the consumer must not leave the feed thread blocked
    on a full queue holding staged batches (resource leak on device OOM)."""
    import threading
    import time as _time

    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import _prefetched

    started = threading.active_count()
    gen = _prefetched(range(100), lambda x: x, depth=2)
    got = [next(gen), next(gen)]
    assert got == [0, 1]
    gen.close()  # consumer dies mid-iteration (the step-raised case)
    for _ in range(100):  # feed thread should exit promptly
        if threading.active_count() <= started:
            break
        _time.sleep(0.05)
    assert threading.active_count() <= started


def test_prefetched_propagates_worker_exception():
    from mhm2_kmer_analysis_v2_tpu.pipeline.analysis import _prefetched

    import pytest

    def boom(x):
        if x == 3:
            raise RuntimeError("staged failure")
        return x

    gen = _prefetched(range(10), boom, depth=2)
    with pytest.raises(RuntimeError, match="staged failure"):
        list(gen)
