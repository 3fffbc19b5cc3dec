"""Pair-merge semantics: overlap detection, quality model, ambiguity."""

import numpy as np
import pytest

from mhm2_kmer_analysis_v2_tpu.io.merge_reads import (
    MergeStats,
    _merge_fast,
    _merge_scalar,
    merge_pair,
    revcomp,
)


def _mk_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), n))


def _quals(n, q=40, offset=33):
    return chr(offset + q) * n


def test_simple_overlap_merge():
    g = _mk_genome(150, seed=1)
    seq1 = g[:100]
    seq2 = revcomp(g[50:150])
    stats = MergeStats()
    merged, mseq, mquals = merge_pair(seq1, _quals(100), seq2, _quals(100), 33, stats)
    assert merged
    assert mseq == g
    assert stats.num_merged == 1
    assert stats.overlap_len == 50
    # overlap matches boost quality to the cap 41+33
    assert all(ord(c) == 33 + 41 for c in mquals[50:100])
    # non-overlap keeps original
    assert all(ord(c) == 33 + 40 for c in mquals[:50])


def test_no_overlap_no_merge():
    g1 = _mk_genome(80, seed=2)
    g2 = _mk_genome(80, seed=3)
    merged, _, _ = merge_pair(g1, _quals(80), g2, _quals(80))
    assert not merged


def test_mismatch_tolerated_and_base_picking():
    g = _mk_genome(150, seed=4)
    seq1 = list(g[:100])
    # put one sequencing error in read1's overlap region with LOW quality
    seq1[70] = "ACGT"[("ACGT".index(seq1[70]) + 1) % 4]
    seq1 = "".join(seq1)
    q1 = list(_quals(100, 40))
    q1[70] = chr(33 + 5)  # low qual at the error
    seq2 = revcomp(g[50:150])
    merged, mseq, mquals = merge_pair(seq1, "".join(q1), seq2, _quals(100, 40))
    assert merged
    # the higher-quality read2 base wins -> restored genome base
    assert mseq == g
    # discounted quality at the disagreement: 40-5=35
    assert ord(mquals[70]) == 33 + 35


def test_close_quality_mismatches_rejected():
    """Mismatches with similar quality add 0.5 perror each; enough of them
    push perror/overlap over MAX_PERROR=0.025 -> no merge."""
    g = _mk_genome(150, seed=5)
    seq1 = list(g[:100])
    for p in (60, 70, 80):
        seq1[p] = "ACGT"[("ACGT".index(seq1[p]) + 1) % 4]
    seq1 = "".join(seq1)
    seq2 = revcomp(g[50:150])
    merged, _, _ = merge_pair(seq1, _quals(100, 40), seq2, _quals(100, 40))
    assert not merged  # 3 * 0.5 / 50 = 0.03 > 0.025


def test_ambiguous_tandem_repeat():
    """A long exact repeat creates two valid overlaps -> ambiguous."""
    unit = _mk_genome(30, seed=6)
    g = unit * 6
    seq1 = g[:100]
    seq2 = revcomp(g[40:140])
    stats = MergeStats()
    merged, _, _ = merge_pair(seq1, _quals(100), seq2, _quals(100), 33, stats)
    assert not merged
    assert stats.num_ambiguous == 1


def test_fast_equals_scalar_on_n_free():
    rng = np.random.default_rng(7)
    for trial in range(30):
        g = _mk_genome(200, seed=100 + trial)
        ov = int(rng.integers(5, 90))
        l1 = int(rng.integers(40, 100))
        l2 = int(rng.integers(40, 100))
        seq1 = g[:l1]
        start2 = max(0, l1 - ov)
        seq2 = revcomp(g[start2 : start2 + l2])
        q1 = "".join(chr(33 + int(q)) for q in rng.integers(2, 41, l1))
        q2 = "".join(chr(33 + int(q)) for q in rng.integers(2, 41, l2))
        rc2, rq2 = revcomp(seq2), q2[::-1]
        sf, ss = MergeStats(), MergeStats()
        rf = _merge_fast(seq1, q1, rc2, rq2, 33, sf)
        rs = _merge_scalar(seq1, q1, rc2, rq2, 33, ss)
        assert rf == rs, (trial, ov, l1, l2)
        assert sf.num_ambiguous == ss.num_ambiguous


def test_n_in_overlap_uses_scalar_path():
    g = _mk_genome(150, seed=8)
    seq1 = g[:100][:70] + "N" + g[:100][71:]
    seq2 = revcomp(g[50:150])
    merged, mseq, _ = merge_pair(seq1, _quals(100), seq2, _quals(100))
    # single N mismatch: still merges, N replaced by read2's base
    assert merged
    assert mseq == g


def test_many_ns_abort():
    g = _mk_genome(150, seed=9)
    s = list(g[:100])
    for p in (60, 65, 70, 75):
        s[p] = "N"
    seq2 = revcomp(g[50:150])
    stats = MergeStats()
    merged, _, _ = merge_pair("".join(s), _quals(100), seq2, _quals(100), 33, stats)
    assert not merged  # Ncount > 3 aborts (merge_reads.cpp:545-549)


def test_iupac_codes_use_scalar_path():
    """Regression: non-ACGT IUPAC codes (R, Y, ...) revcomp to N, so the
    native fast path must decline the pair (-4) and let the exact scalar
    N-handling run — previously only literal 'N' was screened."""
    g = _mk_genome(150, seed=10)
    for mutate_first in (True, False):
        seq1 = g[:100]
        seq2 = revcomp(g[50:150])
        if mutate_first:
            seq1 = seq1[:70] + "R" + seq1[71:]
        else:
            seq2 = seq2[:30] + "Y" + seq2[31:]
        q1, q2 = _quals(100), _quals(100)
        stats = MergeStats()
        got = merge_pair(seq1, q1, seq2, q2, 33, stats)
        rc2 = revcomp(seq2)
        exp = _merge_scalar(seq1, q1, rc2, q2[::-1], 33, MergeStats())
        assert got == exp, mutate_first
