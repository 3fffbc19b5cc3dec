"""Native C++ kernels vs their Python reference implementations."""

import numpy as np
import pytest

from mhm2_kmer_analysis_v2_tpu.io import native
from mhm2_kmer_analysis_v2_tpu.io.merge_reads import (
    MergeStats,
    _merge_fast,
    revcomp,
)
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch

from util import random_reads

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable (no g++)"
)


def test_count_mismatches():
    lib = native.get_lib()
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 200))
        a = bytes(rng.integers(65, 70, n).astype(np.uint8))
        b = bytearray(a)
        nmut = int(rng.integers(0, 8))
        for _ in range(nmut):
            b[int(rng.integers(0, n))] ^= 1
        exp = sum(1 for x, y in zip(a, bytes(b)) if x != y)
        got = lib.knat_count_mismatches(a, bytes(b), n, 10**6)
        assert got == exp


def test_encode_matches_python():
    reads = random_reads(40, 20, 120, seed=2, with_n=True)
    seqs = [s for s, _ in reads]
    quals = [q for _, q in reads]
    nat = native.encode_reads_native(seqs, quals, 33, 120, None)
    assert nat is not None
    codes, badq, lengths = nat
    # force the python path by bypassing native
    import mhm2_kmer_analysis_v2_tpu.io.packed_reads as prm

    b2 = prm.ReadBatch(
        codes=np.full((40, 120), 4, np.uint8),
        badq=np.zeros((40, 120), bool),
        lengths=np.zeros(40, np.int32),
    )
    thresh = 33 + 20
    for i, (s, q) in enumerate(zip(seqs, quals)):
        sb = np.frombuffer(s.encode(), np.uint8)
        b2.codes[i, : len(s)] = prm._LUT[sb]
        b2.badq[i, : len(s)] = np.frombuffer(q.encode(), np.uint8) < thresh
        b2.lengths[i] = len(s)
    assert (codes == b2.codes).all()
    assert (badq == b2.badq).all()
    assert (lengths == b2.lengths).all()


def test_encode_rejects_illegal():
    with pytest.raises(ValueError):
        native.encode_reads_native(["ACGX"], ["KKKK"], 33, 4, None)


def test_merge_scan_matches_python():
    rng = np.random.default_rng(3)
    agree = 0
    for trial in range(60):
        g = "".join(rng.choice(list("ACGT"), 200))
        ov = int(rng.integers(5, 90))
        l1 = int(rng.integers(40, 100))
        l2 = int(rng.integers(40, 100))
        seq1 = g[:l1]
        start2 = max(0, l1 - ov)
        seq2 = revcomp(g[start2 : start2 + l2])
        q1 = "".join(chr(33 + int(q)) for q in rng.integers(2, 41, l1))
        q2 = "".join(chr(33 + int(q)) for q in rng.integers(2, 41, l2))
        rc2, rq2 = revcomp(seq2), q2[::-1]
        got = native.merge_scan_native(seq1, q1, rc2, rq2, 33)
        stats = MergeStats()
        ref = _merge_fast(seq1, q1, rc2, rq2, 33, stats)
        if got == -2:
            assert stats.num_ambiguous == 1 and ref[0] is False
        elif got >= 0:
            assert ref[0] is True
            # identical merged sequence via the chosen offset
            from mhm2_kmer_analysis_v2_tpu.io.merge_reads import _finish_merge

            len_ = min(len(rc2), len(seq1))
            start_i = 0 if len_ == len(seq1) else len(seq1) - len_
            nat_merged = _finish_merge(seq1, q1, rc2, rq2, 33, got, start_i, MergeStats())
            assert nat_merged[1] == ref[1]
            assert nat_merged[2] == ref[2]
            agree += 1
        else:
            assert ref[0] is False
    assert agree > 10  # the generator produces plenty of real overlaps


def test_merge_scan_bad_quality_raises():
    with pytest.raises(ValueError):
        native.merge_scan_native("ACGT" * 10, chr(130) * 40, "ACGT" * 10, "K" * 40, 33)


def test_revcomp_native():
    from mhm2_kmer_analysis_v2_tpu.io.merge_reads import _COMP

    rng = np.random.default_rng(5)
    for _ in range(20):
        s = "".join(rng.choice(list("ACGTN"), int(rng.integers(1, 200))))
        exp = "".join(_COMP.get(c, "N") for c in reversed(s))
        assert native.revcomp_native(s) == exp
    # IUPAC -> N
    assert native.revcomp_native("ARYG") == "CNNT"
    with pytest.raises(ValueError):
        native.revcomp_native("ACGX")


def test_finish_merge_native_matches_python():
    from mhm2_kmer_analysis_v2_tpu.io.merge_reads import MergeStats, _finish_merge, revcomp

    rng = np.random.default_rng(6)
    for trial in range(30):
        g = "".join(rng.choice(list("ACGT"), 250))
        l1 = int(rng.integers(40, 120))
        l2 = int(rng.integers(40, 120))
        seq1 = list(g[:l1])
        # sprinkle mismatches in the overlap
        for _ in range(3):
            p = int(rng.integers(0, l1))
            seq1[p] = "ACGT"[int(rng.integers(4))]
        seq1 = "".join(seq1)
        ov = int(rng.integers(12, min(l1, l2)))
        start2 = max(0, l1 - ov)
        rc2 = g[start2 : start2 + l2]
        q1 = "".join(chr(33 + int(q)) for q in rng.integers(2, 41, l1))
        rq2 = "".join(chr(33 + int(q)) for q in rng.integers(2, 41, l2))
        len_ = min(l1, l2)
        start_i = 0 if len_ == l1 else l1 - len_
        best_i = int(rng.integers(0, len_ - 12))
        exp = _finish_merge(seq1, q1, rc2, rq2, 33, best_i, start_i, MergeStats())
        got = native.finish_merge_native(seq1, q1, rc2, rq2, best_i, start_i, 33)
        assert got == (exp[1], exp[2]), trial
