"""Vectorized (numpy) re-implementation of the scalar oracle, k <= 160.

Same semantics as `oracle.OracleCounter` (which carries the reference
file:line citations): counted positions 1..L-k-1, N->G inside k-mer values
(src/kmer.cpp:173 with check_n=false), extension tallies skipped for
low-quality or non-ACGT neighbors, uint16 saturation, dmin_dyn extension
call with C-double truncation, count<2 and X/F purges
(src/kcount/kcount_cpu.cpp:173-182,523-601).

The scalar oracle is O(read-length) Python per read and tops out around
1e5 k-mers/s; this one does ~2k numpy passes per chunk and handles the
golden-count scale (~150M positions -> 34.5M unique) in minutes, letting us
verify pipeline output at the reference's own benchmark scale instead of
only on toy inputs.
"""

from __future__ import annotations

import numpy as np

from .oracle import DYN_MIN_DEPTH, KCOUNT_QUAL_CUTOFF

UINT16_MAX = 0xFFFF
# (1.0 - DYN_MIN_DEPTH) evaluated in double precision, as the C expression
# (int)((1.0 - DYN_MIN_DEPTH) * count) does (kcount_cpu.cpp:177)
_DMIN_FACTOR = np.float64(1.0) - np.float64(DYN_MIN_DEPTH)

# base byte -> 2-bit code with N -> G(2), the (c&4)>>1 bit-trick table
_KCODE = np.full(256, 0, np.uint8)
for _b, _c in zip(b"ACGTN", (0, 1, 2, 3, 2)):
    _KCODE[_b] = _c
    _KCODE[_b + 32] = _c  # lowercase (bad-qual marking) packs the same
_IS_ACGT = np.zeros(256, bool)
for _b in b"ACGT":
    _IS_ACGT[_b] = True
    # lowercase is NOT acgt for extension purposes: a bad-qual neighbor
    # tallies as '0' (oracle.add_read:268-269)

_BASES = np.frombuffer(b"ACGT", np.uint8)


def words_to_base_matrix(words: np.ndarray, k: int) -> np.ndarray:
    """[U, W64] u64 word matrix (finalize_arrays' k>32 layout: word 0 = first
    k-32*(W64-1) bases) -> [U, k] uint8 ASCII base matrix, row order
    preserved (both are lexicographic k-mer order)."""
    U, W64 = words.shape
    r0 = k - 32 * (W64 - 1)
    widths = [r0] + [32] * (W64 - 1)
    mat = np.empty((U, k), np.uint8)
    col = 0
    for j, w in enumerate(widths):
        word = words[:, j]
        for i in range(w):
            mat[:, col + i] = _BASES[
                ((word >> np.uint64(2 * (w - 1 - i))) & np.uint64(3)).astype(np.int64)
            ]
        col += w
    return mat


class FastOracleCounter:
    """Drop-in OracleCounter analogue for large inputs, including the
    ctg-kmer carryover pass (add_ctg_seqs) for multi-k round replay."""

    def __init__(self, k: int, qual_offset: int = 33, dmin_thres: int = 2):
        assert k <= 160, "fast oracle covers the reference MAX_K set (<=160)"
        self.k = k
        self.qual_offset = qual_offset
        self.dmin_thres = dmin_thres
        # canonical value per counted position: one u64 word for k<=32, else
        # a W64 = ceil(k/32) u64 word stack (word 0 = first r = k-32*(W64-1)
        # bases, then 32-base words — lexicographic like the reference's
        # big-endian longs, src/kmer.hpp:64-65)
        self.n_words64 = max(1, -(-k // 32))
        self._vals: list[np.ndarray] = []  # k<=32: [n]; else [W64, n] stacks
        self._lext: list[np.ndarray] = []  # 0..3 = ACGT tally, 4 = none
        self._rext: list[np.ndarray] = []
        # ctg-kmer carryover occurrences (add_ctg_seqs): canonical vals,
        # oriented ext codes (always 0..3 inside a contig), int depths
        self._ctg_vals: list[np.ndarray] = []
        self._ctg_l: list[np.ndarray] = []
        self._ctg_r: list[np.ndarray] = []
        self._ctg_d: list[np.ndarray] = []
        self._finalized = None

    # -- ingest ----------------------------------------------------------
    def add_reads(self, seqs: list, quals: list | None = None):
        """Tally a chunk of reads (strings, or anything ''.join accepts)."""
        k = self.k
        flat = np.frombuffer("".join(seqs).encode(), np.uint8)
        lens = np.fromiter((len(s) for s in seqs), np.int64, count=len(seqs))
        off = np.zeros(len(seqs) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        if quals is not None:
            qflat = np.frombuffer("".join(quals).encode(), np.uint8)
            assert len(qflat) == len(flat)
            good = qflat >= self.qual_offset + KCOUNT_QUAL_CUTOFF
        else:
            # pre-masked input: lowercase marks bad quality
            good = flat < ord("a")
        ext_ok = _IS_ACGT[flat] & good

        # counted positions: for each read with L >= k+2, i in 1..L-k-1
        n_pos = np.maximum(lens - k - 1, 0)
        # reads shorter than k+2 contribute nothing (kcount.cpp:78 + window)
        starts = np.repeat(off[:-1] + 1, n_pos)
        if len(starts) == 0:
            return
        # within-read position offsets
        idx = starts + (np.arange(len(starts)) - np.repeat(
            np.cumsum(np.concatenate([[0], n_pos[:-1]])), n_pos))

        canon, flip = self._canon_flip(flat, idx)

        le = np.where(ext_ok[idx - 1], _KCODE[flat[idx - 1]], 4).astype(np.uint8)
        re_ = np.where(ext_ok[idx + k], _KCODE[flat[idx + k]], 4).astype(np.uint8)
        # flipped k-mers swap and complement their extensions
        fle = np.where(re_ == 4, 4, 3 - re_).astype(np.uint8)
        fre = np.where(le == 4, 4, 3 - le).astype(np.uint8)
        self._vals.append(canon)
        self._lext.append(np.where(flip, fle, le))
        self._rext.append(np.where(flip, fre, re_))
        self._finalized = None

    def _canon_flip(self, flat: np.ndarray, idx: np.ndarray):
        """Canonical k-mer value(s) + flip flag for each position `idx` of the
        flat base-byte array.

        O(log k) window pyramids over the flat base array (the same doubling
        trick as the device path, ops/kmer_ops.py): fw[m][p] = 2-bit pack of
        bases [p, p+m); rc[m][p] = pack of their revcomp.  Window values at
        sequence boundaries mix neighboring sequences, but idx only selects
        interior positions so those lanes are never read."""
        k = self.k
        codes = _KCODE[flat].astype(np.uint64)
        fw = {1: codes}
        rcw = {1: np.uint64(3) ^ codes}
        m = 1
        word = min(k, 32)  # longest single-word window we compose
        while 2 * m <= word:
            prev_f, prev_r = fw[m], rcw[m]
            sh = np.uint64(2 * m)
            nxt_f = np.zeros(len(codes), np.uint64)
            nxt_r = np.zeros(len(codes), np.uint64)
            nxt_f[: -m or None] = (prev_f[:-m] << sh) | prev_f[m:]
            nxt_r[: -m or None] = (prev_r[m:] << sh) | prev_r[:-m]
            m *= 2
            fw[m], rcw[m] = nxt_f, nxt_r

        def compose_f(p0, L):
            """2-bit pack of bases [p, p+L) per position, from the pyramid."""
            v = np.zeros(len(p0), np.uint64)
            p = p0.copy()
            rem = L
            for mm in sorted(fw, reverse=True):
                if mm <= rem:
                    v = (v << np.uint64(2 * mm)) | fw[mm][p]
                    p += mm
                    rem -= mm
                if rem == 0:
                    break
            return v

        def compose_r(p0, L):
            """2-bit pack of the revcomp of bases [p, p+L) per position."""
            r = np.zeros(len(p0), np.uint64)
            p = p0.copy()
            rem = L
            for mm in sorted(fw, reverse=True):
                if mm <= rem:
                    r |= rcw[mm][p] << np.uint64(2 * (L - rem))
                    p += mm
                    rem -= mm
                if rem == 0:
                    break
            return r

        if k <= 32:
            v = compose_f(idx, k)
            r = compose_r(idx, k)
            flip = r < v
            canon = np.where(flip, r, v)
        else:
            # W64 words: word 0 = first r bases, then 32-base words; the word
            # stack compares like the full 2k-bit integer (lexicographic).
            # revcomp word j = rc of the mirrored input chunk.
            W64 = self.n_words64
            r0 = k - 32 * (W64 - 1)
            widths = [r0] + [32] * (W64 - 1)
            offs = np.cumsum([0] + widths[:-1])
            v_w = [compose_f(idx + o, w) for o, w in zip(offs, widths)]
            r_w = [compose_r(idx + k - o - w, w) for o, w in zip(offs, widths)]
            flip = np.zeros(len(idx), bool)
            eq = np.ones(len(idx), bool)
            for vw, rw in zip(v_w, r_w):
                flip |= eq & (rw < vw)
                eq &= rw == vw
            canon = np.stack(
                [np.where(flip, rw, vw) for vw, rw in zip(v_w, r_w)]
            )
        return canon, flip

    def add_ctg_seqs(self, seqs: list, depths: list):
        """Vectorized contig-kmer carryover (oracle.add_ctg_seq is the scalar
        spec, insert_supermer_from_ctg src/kcount/kcount_cpu.cpp:357-407):
        records every counted contig position (1..L-k-1, ACGT-only contigs)
        with its truncated-int depth; the from-ctg merge rules apply at
        finalize via the same occurrence reduction the device pass uses
        (shard_table.insert_ctg_batch: per unique k-mer, depth = min over
        occurrences, any extension disagreement purges via depth 0 — proven
        equal to the scalar occurrence-by-occurrence loop for depth >= 2,
        which contig mean depths always satisfy since finalize keeps only
        count >= 2 k-mers)."""
        k = self.k
        if not seqs:
            return
        flat = np.frombuffer("".join(seqs).encode(), np.uint8)
        lens = np.fromiter((len(s) for s in seqs), np.int64, count=len(seqs))
        off = np.zeros(len(seqs) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        n_pos = np.maximum(lens - k - 1, 0)
        starts = np.repeat(off[:-1] + 1, n_pos)
        if len(starts) == 0:
            return
        idx = starts + (np.arange(len(starts)) - np.repeat(
            np.cumsum(np.concatenate([[0], n_pos[:-1]])), n_pos))
        canon, flip = self._canon_flip(flat, idx)
        le = _KCODE[flat[idx - 1]].astype(np.uint8)
        re_ = _KCODE[flat[idx + k]].astype(np.uint8)
        l_o = np.where(flip, 3 - re_, le).astype(np.uint8)
        r_o = np.where(flip, 3 - le, re_).astype(np.uint8)
        # float depths quantize exactly as the pipeline feed does
        # (analysis.py ctg pass: max(1, min(int(round(d)), 65535)); zero
        # depth -> 1 per SeqBlockInserter::process_seq, kcount.cpp:75)
        di = np.clip(np.round(np.asarray(depths, np.float64)), 1, UINT16_MAX)
        d = np.repeat(di.astype(np.int64), n_pos)
        self._ctg_vals.append(canon)
        self._ctg_l.append(l_o)
        self._ctg_r.append(r_o)
        self._ctg_d.append(d)
        self._finalized = None

    def add_fastq(self, fname: str, chunk_reads: int = 200_000):
        from .io.fastq import FastqReader

        rdr = FastqReader(fname)
        seqs, quals = [], []
        for rec in rdr:
            seqs.append(rec.seq)
            quals.append(rec.quals)
            if len(seqs) >= chunk_reads:
                self.add_reads(seqs, quals)
                seqs, quals = [], []
        if seqs:
            self.add_reads(seqs, quals)
        rdr.close()

    # -- finalize ----------------------------------------------------------
    def _reduce(self):
        if self._finalized is not None:
            return self._finalized
        lext = np.concatenate(self._lext) if self._lext else np.zeros(0, np.uint8)
        rext = np.concatenate(self._rext) if self._rext else np.zeros(0, np.uint8)
        # sort + segment-reduce (np.unique(return_inverse=True) is ~20x
        # slower than argsort at this scale in this numpy build)
        if self.k <= 32:
            vals = (np.concatenate(self._vals) if self._vals
                    else np.zeros(0, np.uint64))
            order = np.argsort(vals, kind="stable")
            sv = vals[order]
            newseg = np.ones(len(sv), bool)
            np.not_equal(sv[1:], sv[:-1], out=newseg[1:])
            uniq = sv[newseg]
        else:
            W64 = self.n_words64
            words = (np.concatenate(self._vals, axis=1) if self._vals
                     else np.zeros((W64, 0), np.uint64))
            # np.lexsort: LAST key is primary -> pass words least- to
            # most-significant
            order = np.lexsort(tuple(words[::-1]))
            sw = words[:, order]
            newseg = np.ones(sw.shape[1], bool)
            if sw.shape[1]:
                newseg[1:] = False
            for j in range(W64):
                newseg[1:] |= sw[j, 1:] != sw[j, :-1]
            # [U, W64] columns, most-significant word first
            uniq = sw[:, newseg].T.copy()
        U = len(uniq)
        # dtype matters: cumsum over a bool array without it takes a
        # pathological accumulate path (~100x) in this numpy build
        seg = np.cumsum(newseg, dtype=np.int64) - 1  # group id per sorted pos
        counts = np.minimum(np.bincount(seg, minlength=U), UINT16_MAX)
        ls = lext[order]
        rs = rext[order]
        lsel = ls < 4
        rsel = rs < 4
        lcnt = np.minimum(
            np.bincount(seg[lsel] * 4 + ls[lsel], minlength=U * 4), UINT16_MAX
        ).reshape(U, 4)
        rcnt = np.minimum(
            np.bincount(seg[rsel] * 4 + rs[rsel], minlength=U * 4), UINT16_MAX
        ).reshape(U, 4)
        self._finalized = (uniq, counts.astype(np.int64), lcnt, rcnt)
        return self._finalized

    def _call_ext(self, cnt4: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Vectorized ExtCounts::get_ext: returns byte 'A'/'C'/'G'/'T'/'X'/'F'.

        Ties break toward the later base (sorted(..., reverse=True) on
        (count, base) pairs in the scalar oracle)."""
        key = cnt4.astype(np.int64) * 4 + np.arange(4)
        top = np.argmax(key, axis=1)
        top_c = np.take_along_axis(cnt4, top[:, None], axis=1)[:, 0].astype(np.int64)
        masked = cnt4.astype(np.int64).copy()
        np.put_along_axis(masked, top[:, None], -1, axis=1)
        runner_c = masked.max(axis=1)
        dmin = np.maximum((_DMIN_FACTOR * counts).astype(np.int64), self.dmin_thres)
        out = _BASES[top].copy()
        out[runner_c >= dmin] = ord("F")
        out[top_c < dmin] = ord("X")
        return out

    def _ctg_reduce(self):
        """Reduce ctg-kmer occurrences per unique canonical k-mer: depth = min
        over occurrences, any (L, R) extension disagreement -> depth 0 (the
        purge marker) — the insert_ctg_batch occurrence reduction."""
        l = np.concatenate(self._ctg_l)
        r = np.concatenate(self._ctg_r)
        d = np.concatenate(self._ctg_d)
        if self.k <= 32:
            vals = np.concatenate(self._ctg_vals)
            order = np.argsort(vals, kind="stable")
            sv = vals[order]
            newseg = np.ones(len(sv), bool)
            np.not_equal(sv[1:], sv[:-1], out=newseg[1:])
            uniq = sv[newseg]
        else:
            W64 = self.n_words64
            words = np.concatenate(self._ctg_vals, axis=1)
            order = np.lexsort(tuple(words[::-1]))
            sw = words[:, order]
            newseg = np.ones(sw.shape[1], bool)
            if sw.shape[1]:
                newseg[1:] = False
            for j in range(W64):
                newseg[1:] |= sw[j, 1:] != sw[j, :-1]
            uniq = sw[:, newseg].T.copy()
        gs = np.nonzero(newseg)[0]
        sl, sr, sd = l[order], r[order], d[order]
        ep = sl.astype(np.int64) * 4 + sr
        ud = np.minimum.reduceat(sd, gs) if len(gs) else sd[:0]
        emin = np.minimum.reduceat(ep, gs) if len(gs) else ep[:0]
        emax = np.maximum.reduceat(ep, gs) if len(gs) else ep[:0]
        ud = np.where(emin != emax, 0, ud)
        return uniq, sl[newseg], sr[newseg], ud

    @staticmethod
    def _void_rows(mat: np.ndarray) -> np.ndarray:
        """[N, W64] u64 rows -> void keys whose byte order equals the numeric
        lexicographic row order (big-endian words)."""
        be = np.ascontiguousarray(mat.astype(">u8"))
        return be.view(np.dtype((np.void, 8 * mat.shape[1]))).ravel()

    def finalize_arrays(self):
        """(sorted canonical vals, counts, left char bytes, right char
        bytes) of surviving k-mers — the purge rules of finalize().

        vals is a 1-D u64 array for k<=32, else a [U, W64] u64 word matrix
        (word 0 = first k-32*(W64-1) bases); both orders are the
        lexicographic canonical k-mer order."""
        uniq, counts, lcnt, rcnt = self._reduce()
        lch = self._call_ext(lcnt, counts)
        rch = self._call_ext(rcnt, counts)
        if self._ctg_vals:
            cu, cl, cr, cd = self._ctg_reduce()
            Uc = len(cd)
            # a ctg entry's tallies are {count=d, left=[d@L], right=[d@R]}
            # (oracle.add_ctg_seq:325-333); call its exts through the same
            # dmin rules so dmin_thres > 2 configurations stay exact
            ccnt = np.zeros((Uc, 4), np.int64)
            ccnt[np.arange(Uc), cl] = np.minimum(cd, UINT16_MAX)
            clch = self._call_ext(ccnt, cd)
            ccnt[:] = 0
            ccnt[np.arange(Uc), cr] = np.minimum(cd, UINT16_MAX)
            crch = self._call_ext(ccnt, cd)
            # locate ctg kmers in the read table
            if uniq.ndim == 1:
                j = np.searchsorted(uniq, cu)
                jc = np.minimum(j, max(len(uniq) - 1, 0))
                present = (j < len(uniq)) & (uniq[jc] == cu) if len(uniq) \
                    else np.zeros(Uc, bool)
            else:
                uv = self._void_rows(uniq)
                cv = self._void_rows(cu)
                j = np.searchsorted(uv, cv)
                jc = np.minimum(j, max(len(uv) - 1, 0))
                present = (j < len(uv)) & (uv[jc] == cv) if len(uv) \
                    else np.zeros(Uc, bool)
            counts = counts.copy()
            lch = lch.copy()
            rch = rch.copy()
            # overwrite: read singletons and non-UU entries; UU read entries
            # win (kcount_cpu.cpp:357-407 via oracle.add_ctg_seq)
            is_xf = (
                (lch == ord("X")) | (lch == ord("F"))
                | (rch == ord("X")) | (rch == ord("F"))
            )
            ow = present & ((counts[jc] == 1) | is_xf[jc])
            counts[jc[ow]] = cd[ow]
            lch[jc[ow]] = clch[ow]
            rch[jc[ow]] = crch[ow]
            ab = ~present
            if ab.any():
                counts = np.concatenate([counts, cd[ab]])
                lch = np.concatenate([lch, clch[ab]])
                rch = np.concatenate([rch, crch[ab]])
                if uniq.ndim == 1:
                    uniq = np.concatenate([uniq, cu[ab]])
                    order = np.argsort(uniq, kind="stable")
                else:
                    uniq = np.concatenate([uniq, cu[ab]], axis=0)
                    order = np.argsort(self._void_rows(uniq), kind="stable")
                uniq, counts = uniq[order], counts[order]
                lch, rch = lch[order], rch[order]
        keep = (
            (counts >= 2)
            & (lch != ord("X")) & (lch != ord("F"))
            & (rch != ord("X")) & (rch != ord("F"))
        )
        return uniq[keep], counts[keep], lch[keep], rch[keep]

    def finalize(self) -> dict:
        """{kmer_str: (count, L, R)} — matches OracleCounter.finalize()."""
        from .oracle import val_to_kmer

        vals, counts, lch, rch = self.finalize_arrays()
        if vals.ndim == 1:
            ints = vals.astype(object)
        else:
            ints = vals[:, 0].astype(object)
            for j in range(1, vals.shape[1]):
                ints = (ints << 64) | vals[:, j].astype(object)
        return {
            val_to_kmer(int(v), self.k): (int(c), chr(l), chr(r))
            for v, c, l, r in zip(ints, counts, lch, rch)
        }

    def summary(self) -> dict:
        vals, counts, _, _ = self.finalize_arrays()
        return {
            "unique_kmers": int(len(vals)),
            "total_kmer_count_sum": int(counts.sum()),
        }
