"""Adapter trimming: k-mer index, SW identity, trim positions, tpe."""

import numpy as np
import pytest

from mhm2_kmer_analysis_v2_tpu.io.adapters import (
    Adapters,
    _smith_waterman,
    revcomp,
)


def _mk(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), n))


ADAPTER = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"  # TruSeq-like, 33bp


def _adapters(tmp_path, seqs=(ADAPTER,), **kw):
    f = tmp_path / "adapters.fa"
    f.write_text("".join(f">a{i}\n{s}\n" for i, s in enumerate(seqs)))
    return Adapters(fname=str(f), **kw)


def test_smith_waterman_exact_match():
    ref = "AAAA" + ADAPTER + "CCCC"
    score, begin = _smith_waterman(ref, ADAPTER, 1, 1, 1, 1)
    assert score == len(ADAPTER)
    assert begin == 4


def test_smith_waterman_with_mismatch():
    q = "ACGTACGTAC"
    ref = "TTTT" + "ACGTTCGTAC" + "GGG"  # one mismatch inside
    score, begin = _smith_waterman(ref, q, 1, 1, 1, 1)
    assert score == len(q) - 2  # 9 matches - 1 mismatch
    assert begin == 4


def test_trim_at_adapter_position(tmp_path):
    ad = _adapters(tmp_path, use_ssw=True)
    genome = _mk(60, 1)
    # read = 60bp of genome then the full adapter
    seq = genome + ADAPTER
    quals = "K" * len(seq)
    trimmed, s, q = ad.trim("r1", seq, quals)
    assert trimmed
    assert s == genome
    assert len(q) == len(s)


def test_non_ssw_records_only_on_second_mismatch(tmp_path):
    """Faithful reference quirk (src/adapters.cpp:218-240): the mismatch-
    extension path records a candidate only when a SECOND mismatch stops the
    extension; a perfect run to the end of the read records nothing (the
    default build uses SSW, where this path is dead)."""
    ad = _adapters(tmp_path, use_ssw=False)
    genome = _mk(60, 1)
    # perfect adapter match to the end -> no trim in non-SSW mode
    trimmed, s, _ = ad.trim("r1", genome + ADAPTER, "K" * (60 + len(ADAPTER)))
    assert not trimmed
    # two mismatches inside the adapter tail -> extension stops, candidate
    # recorded, identity = match_len/adapter_len >= 0.5 -> trimmed
    mut = list(ADAPTER)
    mut[25] = "A" if mut[25] != "A" else "C"
    mut[27] = "A" if mut[27] != "A" else "C"
    seq = genome + "".join(mut) + _mk(20, 9)
    trimmed, s, _ = ad.trim("r1", seq, "K" * len(seq))
    assert trimmed
    assert s == genome


def test_read_removed_when_adapter_at_start(tmp_path):
    """Trim position < 12 removes the whole read (src/adapters.cpp:246-248)."""
    ad = _adapters(tmp_path, use_ssw=True)
    seq = _mk(5, 2) + ADAPTER + _mk(30, 3)
    trimmed, s, q = ad.trim("r1", seq, "K" * len(seq))
    assert trimmed
    assert s == ""
    assert ad.reads_removed == 1


def test_revcomp_adapter_found(tmp_path):
    ad = _adapters(tmp_path)
    seq = _mk(40, 4) + revcomp(ADAPTER)
    trimmed, s, q = ad.trim("r1", seq, "K" * len(seq))
    assert trimmed
    assert len(s) == 40


def test_no_adapter_no_trim(tmp_path):
    ad = _adapters(tmp_path)
    seq = _mk(100, 5)
    trimmed, s, q = ad.trim("r1", seq, "K" * len(seq))
    assert not trimmed
    assert s == seq


def test_trim_pair_tpe(tmp_path):
    """Pairs are cut to equal length after trimming (src/adapters.cpp:260-273)."""
    ad = _adapters(tmp_path)
    g = _mk(80, 6)
    seq1 = g[:50] + ADAPTER  # trimmed to 50
    seq2 = g  # untrimmed, 80
    t, s1, q1, s2, q2 = ad.trim_pair("r1/1", seq1, "K" * len(seq1), "r1/2", seq2, "K" * len(seq2))
    assert t
    assert len(s1) == len(s2) == 50
    assert len(q1) == len(q2) == 50


def test_short_adapters_skipped(tmp_path):
    ad = _adapters(tmp_path, seqs=("ACGTACGT",))  # < 17bp -> ignored
    assert ad.adapter_seqs == []


def test_empty_adapters_noop():
    ad = Adapters(fname="")
    t, s, q = ad.trim("r", "ACGT" * 20, "K" * 80)
    assert not t


BUNDLED_DB = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "data", "all_adapters.fa")


def test_bundled_db_is_the_full_reference_set():
    """The bundled DB must be the reference's full 537-sequence adapter set
    (contrib/all_adapters.fa, loaded at src/adapters.cpp:48-146) — a subset
    diverges trimming (and every downstream count) on real data."""
    from mhm2_kmer_analysis_v2_tpu.io.adapters import load_adapter_fasta
    with open(BUNDLED_DB) as f:
        n_headers = sum(1 for line in f if line.startswith(">"))
    assert n_headers == 537
    seqs = load_adapter_fasta(BUNDLED_DB)
    # every >=17bp sequence is indexed forward + revcomp
    ad = Adapters(fname=BUNDLED_DB)
    assert len(ad.adapter_seqs) == 2 * len(seqs)
    assert len(seqs) >= 500  # only sub-17bp entries may drop


@pytest.mark.parametrize("name,adapter", [
    # present only in the full DB, not the old 15-sequence subset
    ("contam_45", "ATAGACTAGCCTGCCGGTCAATAACTGATGACGCGGAGTCAACCTGATAACCCATAGCGGAACAGTCTAA"),
    ("RPI2", "TGGAATTCTCGGGTGCCAAGGAACTCCAGTCACCGATGTATCTCGTATGCCGTCTTCTGCTTG"),
])
def test_full_db_trims_adapters_absent_from_subset(name, adapter):
    ad = Adapters(fname=BUNDLED_DB)
    genome = _mk(60, 8)
    for spiked in (genome + adapter, genome + revcomp(adapter)):
        trimmed, s, q = ad.trim("r1", spiked, "K" * len(spiked))
        assert trimmed, name
        assert s == genome
        assert len(q) == len(s)


def test_native_trim_matches_python_trim_fuzz():
    """The C++ trim scan (knat_adapters_*) must match the Python semantics
    spec decision-for-decision: same trim?/seq/quals on random reads, reads
    spiked with full/partial/revcomp/mutated adapters at varied positions."""
    from mhm2_kmer_analysis_v2_tpu.io import native as nat
    if nat.get_lib() is None or not hasattr(nat.get_lib(), "knat_adapters_build"):
        pytest.skip("native lib unavailable")
    ad_n = Adapters(fname=BUNDLED_DB)
    assert ad_n._native, "native index must build for the full DB"
    ad_p = Adapters(fname=BUNDLED_DB)
    ad_p._native = None  # force the Python reference path

    rng = np.random.default_rng(123)
    adapters = ad_n.adapter_seqs[::2]  # forward strands
    cases = []
    for i in range(120):
        g = "".join(rng.choice(list("ACGT"), int(rng.integers(30, 140))))
        kind = i % 6
        if kind == 0:
            seq = g  # no adapter
        else:
            a = adapters[int(rng.integers(0, len(adapters)))]
            if kind == 2:
                a = revcomp(a)
            if kind == 3:
                a = a[: max(17, len(a) // 2)]  # partial
            if kind == 4:  # two mutations
                la = list(a)
                for _ in range(2):
                    p = int(rng.integers(0, len(la)))
                    la[p] = "ACGT"[int(rng.integers(0, 4))]
                a = "".join(la)
            cut = int(rng.integers(0, len(g) + 1)) if kind == 5 else len(g)
            seq = g[:cut] + a + g[cut:][: int(rng.integers(0, 20))]
        if "N" not in seq and rng.random() < 0.1:
            p = int(rng.integers(0, len(seq)))
            seq = seq[:p] + "N" + seq[p + 1:]
        cases.append(seq)

    for seq in cases:
        quals = "K" * len(seq)
        got = ad_n.trim("r", seq, quals)
        want = ad_p.trim("r", seq, quals)
        assert got == want, seq
    assert ad_n.stats() == ad_p.stats()
