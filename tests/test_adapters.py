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
