"""Paired-read overlap merging (host side).

Re-design of src/merge_reads.cpp:250-771: for each read pair, reverse-
complement mate 2, slide it along mate 1 scanning all overlap offsets, accept
a unique unambiguous overlap under the quality-probability model, and merge
into a single read (mate 2 becomes the "N" placeholder, read-id parity
encodes pair-ness).

Constants (src/merge_reads.cpp:344-356):
  MIN_OVERLAP=12, EXTRA_TEST_OVERLAP=2, MAX_MISMATCHES=3,
  EXTRA_MISMATCHES_PER_1000=150, MAX_PERROR=0.025, MAX_MATCH_QUAL=41+offset.

The Q2Perror table (src/merge_reads.cpp:74-82) is the standard phred
probability table rounded as in the reference.

The offset scan is numpy-vectorized per pair; reads containing N fall back to
a scalar transcription of the reference loop because the reference *mutates
quality strings mid-scan* for N positions (merge_reads.cpp:516-530), which
couples offsets together.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MIN_OVERLAP = 12
EXTRA_TEST_OVERLAP = 2
MAX_MISMATCHES = 3
EXTRA_MISMATCHES_PER_1000 = 150
MAX_PERROR = 0.025

# phred error probabilities, values as in src/merge_reads.cpp:74-82
Q2PERROR = [
    1.0, 0.7943, 0.6309, 0.5012, 0.3981, 0.3162, 0.2512, 0.1995, 0.1585,
    0.1259, 0.1, 0.07943, 0.06310, 0.05012, 0.03981, 0.03162, 0.02512,
    0.01995, 0.01585, 0.01259, 0.01, 0.007943, 0.006310, 0.005012, 0.003981,
    0.003162, 0.002512, 0.001995, 0.001585, 0.001259, 0.001, 0.0007943,
    0.0006310, 0.0005012, 0.0003981, 0.0003162, 0.0002512, 0.0001995,
    0.0001585, 0.0001259, 0.0001, 7.943e-05, 6.310e-05, 5.012e-05, 3.981e-05,
    3.162e-05, 2.512e-05, 1.995e-05, 1.585e-05, 1.259e-05, 1e-05, 7.943e-06,
    6.310e-06, 5.012e-06, 3.981e-06, 3.162e-06, 2.512e-06, 1.995e-06,
    1.585e-06, 1.259e-06, 1e-06, 7.943e-07, 6.310e-07, 5.012e-07, 3.981e-07,
    3.1622e-07, 2.512e-07, 1.995e-07, 1.585e-07, 1.259e-07, 1e-07, 7.943e-08,
    6.310e-08, 5.012e-08, 3.981e-08, 3.1622e-08, 2.512e-08, 1.995e-08,
    1.585e-08, 1.259e-08, 1e-08,
]
_Q2P = np.array(Q2PERROR)

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def revcomp(seq: str) -> str:
    from .native import revcomp_native

    rc = revcomp_native(seq)
    if rc is not None:
        return rc
    return "".join(_COMP.get(c, "N") for c in reversed(seq))


@dataclass
class MergeStats:
    num_pairs: int = 0
    num_merged: int = 0
    num_ambiguous: int = 0
    merged_len: int = 0
    overlap_len: int = 0


def merge_pair(seq1: str, quals1: str, seq2: str, quals2: str, qual_offset: int = 33,
               stats: MergeStats | None = None):
    """Attempt to merge one pair.  Returns (merged?, seq, quals) where on
    success seq/quals are the merged read, else the (possibly N-adjusted)
    originals are NOT returned — caller keeps its own copies.

    Scalar transcription of the scan at src/merge_reads.cpp:477-652.
    """
    if stats is None:
        stats = MergeStats()
    stats.num_pairs += 1

    # whole pair in one native call (revcomp + validate + scan + finish)
    from .native import merge_pair_native

    nat = merge_pair_native(seq1, quals1, seq2, quals2, qual_offset)
    if nat is not None:
        status, mseq, mquals = nat
        if status == -2:
            stats.num_ambiguous += 1
            return False, None, None
        if status == 0:
            return False, None, None
        stats.num_merged += 1
        stats.merged_len += len(mseq)
        stats.overlap_len += len(seq1) + len(seq2) - len(mseq)
        return True, mseq, mquals

    rc_seq2 = revcomp(seq2)
    rev_quals2 = quals2[::-1]
    if "N" not in seq1 and "N" not in rc_seq2:
        return _merge_fast(seq1, quals1, rc_seq2, rev_quals2, qual_offset, stats)
    return _merge_scalar(seq1, quals1, rc_seq2, rev_quals2, qual_offset, stats)


def _finish_merge(seq1, quals1, rc_seq2, rev_quals2, qual_offset, best_i, start_i, stats):
    """Base-picking + quality boost/discount for the accepted overlap
    (src/merge_reads.cpp:587-648)."""
    len_ = min(len(rc_seq2), len(seq1))
    i = best_i
    overlap = len_ - i
    max_match_qual = 41 + qual_offset
    s1 = list(seq1)
    q1 = list(quals1)
    for j in range(overlap):
        p = start_i + i + j
        if s1[p] == rc_seq2[j]:
            new_q = ord(q1[p]) + ord(rev_quals2[j]) - qual_offset
            q1[p] = chr(min(new_q, max_match_qual))
        else:
            if ord(q1[p]) < ord(rev_quals2[j]):
                new_q = ord(rev_quals2[j]) - ord(q1[p]) + qual_offset
                s1[p] = rc_seq2[j]
            else:
                new_q = ord(q1[p]) - ord(rev_quals2[j]) + qual_offset
            q1[p] = chr(max(new_q, 2 + qual_offset))
    merged_seq = "".join(s1[: start_i + i + overlap]) + rc_seq2[overlap:]
    merged_quals = "".join(q1[: start_i + i + overlap]) + rev_quals2[overlap:]
    stats.num_merged += 1
    stats.merged_len += len(merged_seq)
    stats.overlap_len += overlap
    return True, merged_seq, merged_quals


def _merge_fast(seq1, quals1, rc_seq2, rev_quals2, qual_offset, stats):
    """Vectorized offset scan for N-free pairs (bit-identical outcome to the
    scalar loop: all early-exit conditions are monotone prefixes)."""
    len_ = min(len(rc_seq2), len(seq1))
    start_i = 0 if len_ == len(seq1) else len(seq1) - len_
    a = np.frombuffer(seq1[start_i:].encode(), np.uint8)
    b = np.frombuffer(rc_seq2.encode(), np.uint8)
    qa = np.frombuffer(quals1[start_i:].encode(), np.uint8).astype(np.int32) - qual_offset
    qb = np.frombuffer(rev_quals2.encode(), np.uint8).astype(np.int32) - qual_offset
    if (qa < 0).any() or (qa >= len(_Q2P)).any() or (qb < 0).any() or (qb >= len(_Q2P)).any():
        raise ValueError(
            "Invalid quality score; check the phred offset (phred+64 vs phred+33)"
        )

    best_i = -1
    found_i = -1
    for i in range(0, len_ - MIN_OVERLAP + EXTRA_TEST_OVERLAP):
        overlap = len_ - i
        this_max_mm = MAX_MISMATCHES + (EXTRA_MISMATCHES_PER_1000 * overlap) // 1000
        error_max_mm = this_max_mm * 4 // 3 + 1
        av = a[i : i + overlap]
        bv = b[:overlap]
        mm_mask = av != bv
        mismatches = int(mm_mask.sum())
        if mismatches > error_max_mm:
            continue
        matches = overlap - mismatches
        diffq = np.abs(qa[i : i + overlap] - qb[:overlap])[mm_mask]
        perror = float(np.where(diffq <= 2, 0.5, _Q2P[np.minimum(diffq, len(_Q2P) - 1)]).sum())
        match_thres = max(overlap - this_max_mm, MIN_OVERLAP)
        if matches >= match_thres and mismatches <= this_max_mm and perror / overlap <= MAX_PERROR:
            if best_i < 0 and found_i < 0:
                best_i = i
            else:
                stats.num_ambiguous += 1
                return False, None, None
        elif mismatches <= error_max_mm and perror / overlap <= MAX_PERROR * 4 / 3:
            found_i = i
            if best_i >= 0:
                stats.num_ambiguous += 1
                return False, None, None
    if best_i < 0:
        return False, None, None
    return _finish_merge(
        "".join(seq1), quals1, rc_seq2, rev_quals2, qual_offset, best_i, start_i, stats
    )


def _merge_scalar(seq1, quals1, rc_seq2, rev_quals2, qual_offset, stats):
    """Exact transcription of the reference loop including the mid-scan
    quality mutations for N positions (src/merge_reads.cpp:489-652)."""
    q1 = list(quals1)
    q2 = list(rev_quals2)
    len_ = min(len(rc_seq2), len(seq1))
    start_i = 0 if len_ == len(seq1) else len(seq1) - len_
    # fast_count_mismatches pre-filter operands (raw byte mismatches); numpy
    # slice compares — the python genexpr here was the whole-ingest hotspot
    # for N-containing pairs (~2 ms/pair at L=150)
    a_arr = np.frombuffer(seq1.encode(), np.uint8)
    b_arr = np.frombuffer(rc_seq2.encode(), np.uint8)
    best_i = -1
    found_i = -1
    abort_merge = False
    for i in range(0, len_ - MIN_OVERLAP + EXTRA_TEST_OVERLAP):
        if abort_merge:
            break
        overlap = len_ - i
        this_max_mm = MAX_MISMATCHES + (EXTRA_MISMATCHES_PER_1000 * overlap) // 1000
        error_max_mm = this_max_mm * 4 // 3 + 1
        raw_mm = int(np.count_nonzero(
            a_arr[start_i + i : start_i + i + overlap] != b_arr[:overlap]
        ))
        if raw_mm > error_max_mm:
            continue
        matches = mismatches = both_ns = ncount = 0
        checked = 0
        perror = 0.0
        for j in range(overlap):
            checked += 1
            ps = seq1[start_i + i + j]
            rs = rc_seq2[j]
            if ps == rs:
                matches += 1
                if ps == "N":
                    ncount += 2
                    both_ns += 1
                    if both_ns > 1:
                        abort_merge = True
                        stats.num_ambiguous += 1
                        break
            else:
                mismatches += 1
                if ps == "N":
                    mismatches += 1
                    ncount += 1
                    q1[start_i + i + j] = chr(qual_offset)
                    perror += Q2PERROR[ord(q2[j]) - qual_offset]
                elif rs == "N":
                    ncount += 1
                    mismatches += 1
                    q2[j] = chr(qual_offset)
                    perror += Q2PERROR[ord(q1[start_i + i + j]) - qual_offset]
                qv1 = ord(q1[start_i + i + j]) - qual_offset
                qv2 = ord(q2[j]) - qual_offset
                if qv1 < 0 or qv2 < 0 or qv1 >= len(Q2PERROR) or qv2 >= len(Q2PERROR):
                    raise ValueError("Invalid quality score (phred offset mismatch?)")
                diffq = abs(qv1 - qv2)
                perror += 0.5 if diffq <= 2 else Q2PERROR[diffq]
            if ncount > 3:
                abort_merge = True
                stats.num_ambiguous += 1
                break
            if mismatches > error_max_mm:
                break
        match_thres = max(overlap - this_max_mm, MIN_OVERLAP)
        if (
            matches >= match_thres
            and checked == overlap
            and mismatches <= this_max_mm
            and perror / overlap <= MAX_PERROR
        ):
            if best_i < 0 and found_i < 0:
                best_i = i
            else:
                stats.num_ambiguous += 1
                best_i = -1
                break
        elif checked == overlap and mismatches <= error_max_mm and perror / overlap <= MAX_PERROR * 4 / 3:
            found_i = i
            if best_i >= 0:
                stats.num_ambiguous += 1
                best_i = -1
                break
    if best_i < 0 or abort_merge:
        return False, None, None
    return _finish_merge(
        seq1, "".join(q1), rc_seq2, "".join(q2), qual_offset, best_i, start_i, stats
    )
