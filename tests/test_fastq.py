"""FASTQ reader: parsing, header normalization, block boundary repair."""

import gzip

import pytest

from mhm2_kmer_analysis_v2_tpu.io import fastq

from util import random_reads


def _write_fastq(path, reads, name_fmt="@r{i}/1"):
    with open(path, "w") as f:
        for i, (seq, quals) in enumerate(reads):
            f.write(f"{name_fmt.format(i=i)}\n{seq}\n+\n{quals}\n")


def test_basic_parse(tmp_path):
    reads = random_reads(50, 30, 100, seed=1)
    p = tmp_path / "a.fastq"
    _write_fastq(p, reads)
    got = fastq.read_fastq(str(p))
    assert len(got) == 50
    assert [r.seq for r in got] == [s for s, _ in reads]
    assert [r.quals for r in got] == [q for _, q in reads]
    assert got[0].name == "r0/1"


def test_gzip_parse(tmp_path):
    reads = random_reads(20, 30, 60, seed=2)
    p = tmp_path / "a.fastq.gz"
    with gzip.open(p, "wt") as f:
        for i, (seq, quals) in enumerate(reads):
            f.write(f"@r{i}/1\n{seq}\n+\n{quals}\n")
    got = fastq.read_fastq(str(p))
    assert len(got) == 20
    assert [r.seq for r in got] == [s for s, _ in reads]


def test_header_normalization():
    # Illumina 1.8+ (src/fastq.cpp:118-125)
    assert fastq.get_fq_name("@SRR123.1 1:N:0:ACGT") == "SRR123.1/1"
    assert fastq.get_fq_name("@SRR123.1 2:N:0:ACGT") == "SRR123.1/2"
    # classic
    assert fastq.get_fq_name("@read5/2") == "read5/2"
    # classic with comment (src/fastq.cpp:111-116)
    assert fastq.get_fq_name("@read5/2 some comment") == "read5/2"
    # HudsonAlpha -R1/-R2 (src/fastq.cpp:94-101)
    assert fastq.get_fq_name("@pair-R1") == "pair/1"
    assert fastq.get_fq_name("@pair-R2") == "pair/2"
    # unknown comment stripped (src/fastq.cpp:126-132)
    assert fastq.get_fq_name("@name somejunk") == "name"


def test_block_reads_cover_file_exactly(tmp_path):
    """Byte-range partition with boundary repair: the union of all per-rank
    blocks equals the full file, no dupes, no misses (src/fastq.cpp:810-892)."""
    # include '@' as a quality character to exercise the ambiguity path
    reads = random_reads(200, 40, 120, seed=3, qual_range=(33, 74))
    p = tmp_path / "a.fastq"
    _write_fastq(p, reads)
    full = [r.seq for r in fastq.read_fastq(str(p))]
    for n_ranks in (1, 3, 7):
        got = []
        for rank in range(n_ranks):
            got += [r.seq for r in fastq.read_fastq_block(str(p), rank, n_ranks)]
        assert got == full, f"n_ranks={n_ranks}"


def test_paired_iteration(tmp_path):
    reads1 = random_reads(10, 30, 50, seed=4)
    reads2 = random_reads(10, 30, 50, seed=5)
    p1 = tmp_path / "r1.fastq"
    p2 = tmp_path / "r2.fastq"
    _write_fastq(p1, reads1, "@r{i}/1")
    _write_fastq(p2, reads2, "@r{i}/2")
    pairs = list(fastq.iter_paired([str(p1), str(p2)]))
    assert len(pairs) == 10
    assert pairs[0][0].seq == reads1[0][0]
    assert pairs[0][1].seq == reads2[0][0]

    # interleaved single file
    pi = tmp_path / "il.fastq"
    with open(pi, "w") as f:
        for i in range(10):
            f.write(f"@r{i}/1\n{reads1[i][0]}\n+\n{reads1[i][1]}\n")
            f.write(f"@r{i}/2\n{reads2[i][0]}\n+\n{reads2[i][1]}\n")
    pairs2 = list(fastq.iter_paired([str(pi)]))
    assert [(a.seq, b.seq) for a, b in pairs2] == [(a.seq, b.seq) for a, b in pairs]


def test_subsample(tmp_path):
    reads = random_reads(100, 30, 40, seed=6)
    p = tmp_path / "a.fastq"
    _write_fastq(p, reads)
    got = fastq.read_fastq(str(p), subsample_pct=10)
    assert len(got) == 10  # deterministic modulo selection
    got2 = fastq.read_fastq(str(p), subsample_pct=10)
    assert [r.seq for r in got] == [r.seq for r in got2]


def test_pair_aware_blocks_cover_pairs_exactly_once(tmp_path):
    """Pair-aware byte-range partition: each pair lands in exactly one block
    (the reference's pair-boundary discovery + RPC hand-off equivalent)."""
    rng = __import__("numpy").random.default_rng(9)
    pairs = []
    for i in range(120):
        l1 = int(rng.integers(40, 120))
        l2 = int(rng.integers(40, 120))
        s1 = "".join(rng.choice(list("ACGT"), l1))
        s2 = "".join(rng.choice(list("ACGT"), l2))
        pairs.append((s1, s2))
    p = tmp_path / "il.fastq"
    with open(p, "w") as f:
        for i, (s1, s2) in enumerate(pairs):
            f.write(f"@p{i}/1\n{s1}\n+\n{'K'*len(s1)}\n@p{i}/2\n{s2}\n+\n{'K'*len(s2)}\n")
    for n_ranks in (2, 3, 5):
        names = []
        for rank in range(n_ranks):
            recs = list(fastq.read_fastq_block(str(p), rank, n_ranks, pair_aware=True))
            # every block starts with a /1 and has an even pair structure
            if recs:
                assert recs[0].name.endswith("/1")
            names += [r.name for r in recs]
        assert names == [f"p{i}/{j}" for i in range(120) for j in (1, 2)], n_ranks


def test_read_paired_blocks_staggered(tmp_path):
    """Two-file pair blocks (the set_matching_pair analogue): concatenating
    all ranks' blocks yields exactly the files' pairs even when the two
    files' record byte offsets are badly staggered (very different read and
    quality-line lengths)."""
    import numpy as np
    from mhm2_kmer_analysis_v2_tpu.io.fastq import read_paired_blocks

    rng = np.random.default_rng(11)
    n = 400
    f1, f2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    names = []
    with open(f1, "w") as a, open(f2, "w") as b:
        for i in range(n):
            # file 1 short reads, file 2 long reads -> offsets drift apart
            l1 = int(rng.integers(30, 50))
            l2 = int(rng.integers(120, 250))
            s1 = "".join(rng.choice(list("ACGT"), l1))
            s2 = "".join(rng.choice(list("ACGT"), l2))
            a.write(f"@read{i}/1\n{s1}\n+\n{'I' * l1}\n")
            b.write(f"@read{i}/2\n{s2}\n+\n{'I' * l2}\n")
            names.append(f"read{i}")
    for n_ranks in (1, 3, 4, 7):
        got1, got2 = [], []
        for rank in range(n_ranks):
            b1, b2 = read_paired_blocks(f1, f2, rank, n_ranks)
            assert len(b1) == len(b2)
            for r1, r2 in zip(b1, b2):
                assert r1.name[:-1] == r2.name[:-1], (rank, r1.name, r2.name)
            got1 += [r.name for r in b1]
            got2 += [r.name for r in b2]
        assert got1 == [f"{x}/1" for x in names], n_ranks
        assert got2 == [f"{x}/2" for x in names], n_ranks


def test_check_is_fastq_accepts_and_rejects(tmp_path):
    from mhm2_kmer_analysis_v2_tpu.io.fastq import check_is_fastq

    good = tmp_path / "good.fastq"
    good.write_text("@r0/1\nACGT\n+\nIIII\n@r1/1\nGGTA\n+\nJJJJ\n")
    check_is_fastq(str(good))  # no raise

    import pytest
    fasta = tmp_path / "bad.fasta"
    fasta.write_text(">r0\nACGT\n>r1\nGGTA\n")
    with pytest.raises(ValueError, match="header"):
        check_is_fastq(str(fasta))

    trunc = tmp_path / "trunc.fastq"
    trunc.write_text("@r0/1\nACGT\n+\nIII\n")
    with pytest.raises(ValueError, match="quality length"):
        check_is_fastq(str(trunc))

    badchar = tmp_path / "badchar.fastq"
    badchar.write_text("@r0/1\nAC*T\n+\nIIII\n")
    with pytest.raises(ValueError, match="illegal base"):
        check_is_fastq(str(badchar))

    empty = tmp_path / "empty.fastq"
    empty.write_text("")
    with pytest.raises(ValueError, match="empty"):
        check_is_fastq(str(empty))


def test_estimate_num_reads(tmp_path):
    import numpy as np
    from mhm2_kmer_analysis_v2_tpu.io.fastq import estimate_num_reads

    rng = np.random.default_rng(3)
    path = tmp_path / "est.fastq"
    n = 1000
    with open(path, "w") as f:
        for i in range(n):
            L = int(rng.integers(50, 150))
            s = "".join(rng.choice(list("ACGT"), L))
            f.write(f"@read{i}/1\n{s}\n+\n{'I' * L}\n")
    est = estimate_num_reads(str(path))
    assert 0.8 * n <= est <= 1.2 * n, est


def test_read_batch_equals_per_record(tmp_path):
    """read_batch (bulk assembly) consumes records identically to __next__,
    including byte-range end bounds and truncated/no-trailing-newline tails."""
    reads = random_reads(157, 30, 120, seed=11, qual_range=(33, 74))
    p = tmp_path / "a.fastq"
    _write_fastq(p, reads)
    # strip the trailing newline to exercise the EOF tail path
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-1])

    per = list(iter(fastq.FastqReader(str(p))))
    rdr = fastq.FastqReader(str(p))
    bulk = []
    while True:
        got = rdr.read_batch(13)  # non-divisor batch crosses refill windows
        if not got:
            break
        bulk += got
    assert bulk == per

    # byte-range blocks: bulk consumption must honor per-record end checks
    size = len(raw)
    for n_ranks in (2, 5):
        seqs = []
        for rank in range(n_ranks):
            start = size * rank // n_ranks
            end = size * (rank + 1) // n_ranks
            r = fastq.FastqReader(str(p), start=start, end=end)
            b = []
            while True:
                got = r.read_batch(7)
                if not got:
                    break
                b += got
            # identical to per-record iteration of the same range
            r2 = fastq.FastqReader(str(p), start=start, end=end)
            assert b == list(iter(r2)), (n_ranks, rank)
            seqs += [x.seq for x in b]
        assert seqs == [x.seq for x in per], n_ranks


def test_read_batch_malformed_raises(tmp_path):
    """A malformed record mid-batch returns the good records first, then
    re-raises on the next call (no records silently lost)."""
    p = tmp_path / "bad.fastq"
    with open(p, "w") as f:
        f.write("@r0/1\nACGT\n+\nIIII\n")
        f.write("@r1/1\nACGT\nJUNK\nIIII\n")  # '+' line corrupted
    rdr = fastq.FastqReader(str(p))
    got = rdr.read_batch(10)
    assert [r.name for r in got] == ["r0/1"]
    with pytest.raises(ValueError):
        rdr.read_batch(10)
    # malformed record at the very start of a batch raises immediately
    rdr2 = fastq.FastqReader(str(p))
    assert len(rdr2.read_batch(1)) == 1
    with pytest.raises(ValueError):
        rdr2.read_batch(10)


def test_two_file_missing_mate_resync(tmp_path):
    """Two-file streams with records missing on either side resync by name
    with fake 1-base mates (the reference's missing-mate behavior,
    src/merge_reads.cpp:407-462) instead of silently zip-truncating."""
    f1, f2 = str(tmp_path / "m1.fastq"), str(tmp_path / "m2.fastq")
    n = 30
    drop1 = {12, 21}   # records missing from file 1
    drop2 = {4, 7, 29}  # records missing from file 2
    with open(f1, "w") as a, open(f2, "w") as b:
        for i in range(n):
            if i not in drop1:
                a.write(f"@read{i}/1\nACGTACGTAA\n+\nIIIIIIIIII\n")
            if i not in drop2:
                b.write(f"@read{i}/2\nTTGGCCAAGG\n+\nIIIIIIIIII\n")
    pairs = list(fastq.iter_paired([f1, f2]))
    assert len(pairs) == n
    for i, (r1, r2) in enumerate(pairs):
        assert r1.name == f"read{i}/1" and r2.name == f"read{i}/2", i
        assert (r1.seq == "N") == (i in drop1)
        assert (r2.seq == "N") == (i in drop2)


def test_streaming_block_readers_bounded_memory(tmp_path):
    """read_fastq_block / iter_paired_blocks stream: peak Python allocation
    while consuming a block stays far below the block size (VERDICT r2
    item 3 — reference streams per rank, src/fastq.cpp:1028-1059)."""
    import tracemalloc

    seq = "ACGT" * 40

    def mkfiles(n, tag):
        f1, f2 = str(tmp_path / f"{tag}1.fastq"), str(tmp_path / f"{tag}2.fastq")
        with open(f1, "w") as a, open(f2, "w") as b:
            for i in range(n):
                a.write(f"@read{i}/1\n{seq}\n+\n{'I' * len(seq)}\n")
                b.write(f"@read{i}/2\n{seq}\n+\n{'I' * len(seq)}\n")
        return f1, f2

    def peak_of(gen):
        tracemalloc.start()
        count = sum(1 for _ in gen)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert count > 0
        return peak

    # both block sizes exceed the streaming asymptote (2 x 4096-record
    # batches in flight), so equal peaks == nothing O(block) is held
    small = mkfiles(20000, "s")
    large = mkfiles(160000, "l")  # 8x the data
    # streaming: peak allocation is O(refill chunk + batch), NOT O(block) —
    # an 8x larger block must not grow the peak materially.  Shrink the refill
    # chunk so both files span many refills (equal baseline).
    old_chunk = fastq.FastqReader._CHUNK
    fastq.FastqReader._CHUNK = 256 << 10
    try:
        p_small = peak_of(fastq.read_fastq_block(small[0], 0, 2))
        p_large = peak_of(fastq.read_fastq_block(large[0], 0, 2))
        assert p_large < 1.5 * p_small + (1 << 20), (p_small, p_large)
        p_small = peak_of(fastq.iter_paired_blocks(*small, 0, 2))
        p_large = peak_of(fastq.iter_paired_blocks(*large, 0, 2))
        assert p_large < 1.5 * p_small + (1 << 20), (p_small, p_large)
    finally:
        fastq.FastqReader._CHUNK = old_chunk
