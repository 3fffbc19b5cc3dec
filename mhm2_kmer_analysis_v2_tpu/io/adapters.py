"""Adapter trimming (host side).

Re-design of src/adapters.{hpp,cpp}: adapter FASTA references are indexed by
all 17-mers (POST_ASM_ALN_K, CMakeDefinitions.txt:160) of each adapter and its
reverse complement; per read, any indexed k-mer hit triggers an alignment of
the adapter against the read, and the read is truncated at the best alignment
start when identity >= 0.5 (trim positions < 12 remove the whole read).

Both reference scoring paths are provided:
  - SSW path (default build, MERGE_READS_TRIM_WITH_SSW CMakeDefinitions.txt:48):
    striped Smith-Waterman; here a numpy affine-gap Smith-Waterman with the
    same score sets (ALTERNATE_ALN_SCORES=11111 / BLASTN_ALN_SCORES=23521,
    ssw.cpp:468-480) and the same identity formula
    (src/adapters.cpp:206-216).  Candidates are rare (17-mer hit required), so
    a full DP per candidate is cheap on the host.
  - mismatch-extension path (non-SSW build, src/adapters.cpp:218-240):
    extend the k-mer seed right allowing one mismatch.

Pairs are trimmed to equal length afterwards (tpe, src/adapters.cpp:260-273).
"""

from __future__ import annotations

import numpy as np

ADAPTER_K = 17  # POST_ASM_ALN_K, CMakeDefinitions.txt:160
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def revcomp(seq: str) -> str:
    return "".join(_COMP.get(c, "N") for c in reversed(seq))


def load_adapter_fasta(fname: str, min_len: int = ADAPTER_K) -> list:
    """Parse adapter FASTA; skip sequences shorter than the index k
    (src/adapters.cpp:60-74). One sequence per line like the reference parser."""
    seqs = []
    with open(fname) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(">"):
                continue
            if len(line) < min_len:
                continue
            seqs.append(line.upper())
    return seqs


def _smith_waterman(ref: str, query: str, match: int, mismatch: int, gap_open: int, gap_ext: int):
    """Affine-gap local alignment; returns (best score, ref_begin of the best
    alignment).  ref = the read, query = the adapter (matching the reference's
    Align(adapter, read) argument order where the read is 'ref',
    src/adapters.cpp:206-208).

    Straightforward Gotoh DP with alignment-start tracking.  Candidates are
    rare (a 17-mer index hit is required first), so O(n*m) per candidate is
    fine; the vendored SIMD SSW (src/ssw/ssw_core.cpp) is behavior-matched,
    not ported.
    """
    n, m = len(ref), len(query)
    NEG = -(10**6)
    # H/E/F rows indexed by ref position i (0..n); loop over query j
    H = [0] * (n + 1)
    E = [NEG] * (n + 1)  # gap in ref (consuming query)... along query axis
    Hs = list(range(-1, n))  # start (ref index before aln begin) for H
    Es = [0] * (n + 1)
    best_score, best_begin = 0, 0
    for j in range(1, m + 1):
        qc = query[j - 1]
        prevH, prevHs = H, Hs
        prevE, prevEs = E, Es
        H = [0] * (n + 1)
        Hs = [-1] * (n + 1)
        E = [NEG] * (n + 1)
        Es = [0] * (n + 1)
        f_run, f_start = NEG, 0
        for i in range(1, n + 1):
            # E: gap in ref (vertical, consumes query only)
            e = max(prevH[i] - gap_open, prevE[i] - gap_ext)
            E[i], Es[i] = e, (prevHs[i] if prevH[i] - gap_open >= prevE[i] - gap_ext else prevEs[i])
            # F: gap in query (horizontal, consumes ref only)
            f = max(H[i - 1] - gap_open, f_run - gap_ext)
            f_start = Hs[i - 1] if H[i - 1] - gap_open >= f_run - gap_ext else f_start
            f_run = f
            # diagonal
            d = prevH[i - 1] + (match if ref[i - 1] == qc else -mismatch)
            h, s = d, prevHs[i - 1]
            if E[i] > h:
                h, s = E[i], Es[i]
            if f_run > h:
                h, s = f_run, f_start
            if h <= 0:
                h, s = 0, i - 1
            H[i], Hs[i] = h, s
            if h > best_score:
                best_score, best_begin = h, s + 1
    return int(best_score), int(best_begin)


class Adapters:
    """Adapter index + trimmer (mirrors the Adapters class API)."""

    def __init__(self, adapter_k: int = ADAPTER_K, fname: str = "", use_blastn_scores: bool = False, use_ssw: bool = True):
        self.adapter_k = adapter_k
        self.use_ssw = use_ssw
        # score digit-packs: BLASTN=23521, ALTERNATE=11111 (ssw.cpp:468-480)
        if use_blastn_scores:
            self.match, self.mismatch, self.gap_open, self.gap_ext = 2, 3, 5, 2
        else:
            self.match, self.mismatch, self.gap_open, self.gap_ext = 1, 1, 1, 1
        self.adapter_seqs: list = []
        self.kmer_index: dict = {}
        self.bases_trimmed = 0
        self.reads_removed = 0
        self._native = None
        if fname:
            seqs = load_adapter_fasta(fname, adapter_k)
            self._build_index(seqs)
            if use_ssw and seqs:
                # native fast path: same index + DP transcribed to C++
                # (native/kmer_native.cpp knat_adapters_*); pinned to this
                # Python path bit-for-bit by tests/test_adapters.py
                from . import native as _nat
                self._native = _nat.adapters_build_native(
                    seqs, adapter_k, self.match, self.mismatch,
                    self.gap_open, self.gap_ext,
                )

    def __del__(self):
        if getattr(self, "_native", None):
            try:
                from . import native as _nat
                _nat.adapters_free_native(self._native)
            except Exception:
                pass

    def _build_index(self, seqs: list):
        """Index every k-mer of each adapter AND its revcomp
        (src/adapters.cpp:110-132)."""
        for seq in seqs:
            for s in (seq, revcomp(seq)):
                idx = len(self.adapter_seqs)
                self.adapter_seqs.append(s)
                for j in range(len(s) - self.adapter_k + 1):
                    kmer = s[j : j + self.adapter_k].replace("N", "G")
                    self.kmer_index.setdefault(kmer, []).append((idx, j))

    def trim(self, rid: str, seq: str, quals: str):
        """Returns (trimmed?, seq, quals) — reference Adapters::trim
        (src/adapters.cpp:170-257)."""
        if not self.adapter_seqs:
            return False, seq, quals
        if self._native:
            from .native import adapters_trim_native
            pos = adapters_trim_native(self._native, seq)
            if pos < 0:
                return False, seq, quals
            if pos < 12:
                pos = 0  # too short to keep: remove whole read
            if pos == 0:
                self.reads_removed += 1
            self.bases_trimmed += len(seq) - pos
            return True, seq[:pos], quals[:pos]
        kk = self.adapter_k
        best_identity = 0.0
        best_match_len = 0
        best_trim_pos = len(seq)
        found = False
        # sparse tried-set: with the full 537-adapter DB the dense
        # [False]*1074 per-read list dominated trim time (7x) while reads
        # rarely hit the index at all
        tried: set = set()
        step = 4 if self.use_ssw else 1
        up = seq.upper().replace("N", "G")  # get_kmers maps N->G
        index_get = self.kmer_index.get
        for i in range(0, max(len(seq) - kk + 1, 0), step):
            hits = index_get(up[i : i + kk])
            if not hits:
                continue
            for adapter_index, kmer_offset in hits:
                if adapter_index in tried:
                    continue
                tried.add(adapter_index)
                adapter_seq = self.adapter_seqs[adapter_index]
                if self.use_ssw:
                    a_start = max(0, kmer_offset - i - 2)
                    a_len = min(a_start + len(seq) + 2, len(adapter_seq))
                    sub = adapter_seq[a_start:a_len]
                    score, ref_begin = _smith_waterman(
                        seq, sub, self.match, self.mismatch, self.gap_open, self.gap_ext
                    )
                    max_match_len = min(len(adapter_seq), len(seq) - ref_begin)
                    if max_match_len <= 0:
                        continue
                    identity = score / self.match / max_match_len
                    if identity >= best_identity:
                        best_identity = identity
                        best_trim_pos = ref_begin
                        if identity > 0.97:
                            found = True
                else:
                    # seed-extend with <= 1 mismatch (src/adapters.cpp:218-240)
                    num_mismatches = 0
                    j = 0
                    while True:
                        seq_pos = kk + i + j
                        adapter_pos = kk + kmer_offset + j
                        if seq_pos >= len(seq) or adapter_pos >= len(adapter_seq):
                            break
                        if adapter_seq[adapter_pos] != seq[seq_pos]:
                            num_mismatches += 1
                            if num_mismatches > 1:
                                match_len = kk + j
                                if match_len > best_match_len:
                                    best_identity = match_len / len(adapter_seq)
                                    best_trim_pos = i
                                    best_match_len = match_len
                                    if match_len >= len(adapter_seq) - 1:
                                        found = True
                                break
                        j += 1
                break  # only the first untried adapter per k-mer hit
            if found:
                break

        if best_identity >= 0.5:
            if best_trim_pos < 12:
                best_trim_pos = 0  # too short to keep: remove whole read
            if best_trim_pos == 0:
                self.reads_removed += 1
            self.bases_trimmed += len(seq) - best_trim_pos
            return True, seq[:best_trim_pos], quals[:best_trim_pos]
        return False, seq, quals

    def trim_pair(self, id1, seq1, quals1, id2, seq2, quals2):
        """Trim both mates, then cut to equal length (tpe,
        src/adapters.cpp:260-273)."""
        t1, seq1, quals1 = self.trim(id1, seq1, quals1)
        t2, seq2, quals2 = self.trim(id2, seq2, quals2)
        if (t1 or t2) and len(seq1) > 1 and len(seq2) > 1:
            n = min(len(seq1), len(seq2))
            seq1, quals1, seq2, quals2 = seq1[:n], quals1[:n], seq2[:n], quals2[:n]
        return (t1 or t2), seq1, quals1, seq2, quals2

    def stats(self):
        return {"bases_trimmed": self.bases_trimmed, "reads_removed": self.reads_removed}
