"""Packed read batches: host-side encoding into fixed-shape device arrays.

Re-design of PackedReads (src/packed_reads.{hpp,cpp}): the reference packs
1 byte/base = 3-bit nucleotide + 5-bit capped quality into per-read heap
blocks from a linear allocator (ALLOCATION_BLOCK_SIZE 4 MB,
src/packed_reads.hpp:136); here the store is columnar numpy — one growable
code array (uint8 0-4), one quality array, and an offsets array — so memory
is ~2 B/base with zero per-read Python object overhead, and batches slice
out as fixed-shape [B, Lmax] planes:

  codes: uint8 base code 0-3=ACGT, 4=N (IUPAC -> N, packed_reads.cpp:99-126)
  badq:  bool, quality < qual_offset + KCOUNT_QUAL_CUTOFF(=20) — the explicit
         bit-plane replacing the reference's lowercase-letter marking
         (src/kcount/kcount.cpp:80-85)
  lengths: int32

Only the <20 threshold is consumed downstream, so storing raw quality bytes
is lossless for the pipeline (the reference caps at 5 bits the same way,
src/packed_reads.cpp:126).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..utils.hostmem import host_full

KCOUNT_QUAL_CUTOFF = 20  # CMakeDefinitions.txt:58

# ASCII -> code lookup: ACGT -> 0..3, N/IUPAC -> 4, everything else -> 255
_LUT = np.full(256, 255, np.uint8)
for i, c in enumerate("ACGT"):
    _LUT[ord(c)] = i
    _LUT[ord(c.lower())] = i
for c in "NURYKMSWBDHV":
    _LUT[ord(c)] = 4
    _LUT[ord(c.lower())] = 4
_BASES = np.array(list("ACGTN"))

_CHUNK = 4 << 20  # growable-array chunk, the ALLOCATION_BLOCK_SIZE analogue


@dataclass
class ReadBatch:
    """One fixed-shape batch of encoded reads."""

    codes: np.ndarray  # [B, L] uint8
    badq: np.ndarray  # [B, L] bool
    lengths: np.ndarray  # [B] int32

    @property
    def num_reads(self) -> int:
        return self.codes.shape[0]

    @property
    def max_len(self) -> int:
        return self.codes.shape[1]

    def pack(self):
        """Wire form for host->device transfer: 2-bit base plane (N folded to
        G) + N bitmask + bad-quality bitmask = 0.5 B/base instead of 2 B/base
        (the transfer analogue of the reference's nibble-packed Supermer wire
        format, src/kcount/kmer_dht.cpp:69-100)."""
        B, L = self.codes.shape
        L4 = -(-L // 4) * 4
        codes_g = np.where(self.codes >= 4, 2, self.codes).astype(np.uint8)
        pad = np.zeros((B, L4 - L), np.uint8)
        c = np.concatenate([codes_g, pad], axis=1).reshape(B, L4 // 4, 4)
        shifts = np.array([6, 4, 2, 0], np.uint8)
        code2 = (c << shifts[None, None, :]).sum(axis=2, dtype=np.uint8)
        nmask = np.packbits(self.codes >= 4, axis=1)
        badq = np.packbits(self.badq, axis=1)
        return PackedBatch(code2=code2, nmask=nmask, badq=badq,
                           lengths=self.lengths, max_len=L)


@dataclass
class PackedBatch:
    """Bit-packed wire form of a ReadBatch (see ReadBatch.pack)."""

    code2: np.ndarray  # [B, ceil(L/4)] uint8, 4 bases/byte
    nmask: np.ndarray  # [B, ceil(L/8)] uint8 bitmask of N positions
    badq: np.ndarray  # [B, ceil(L/8)] uint8 bitmask
    lengths: np.ndarray  # [B] int32
    max_len: int

    @property
    def nbytes(self) -> int:
        return self.code2.nbytes + self.nmask.nbytes + self.badq.nbytes + self.lengths.nbytes


class _ByteStore:
    """Growable uint8 store (linear-allocator analogue)."""

    def __init__(self):
        self.buf = np.zeros(_CHUNK, np.uint8)
        self.used = 0

    def append(self, data: np.ndarray):
        n = len(data)
        if self.used + n > len(self.buf):
            # geometric growth: amortized O(1)/byte (linear 4MB chunks would
            # re-copy the whole store O(total/chunk) times at genome scale).
            # np.zeros, not np.empty: zeros gets calloc'd copy-on-write pages
            # while empty's malloc'd pages first-touch-fault ~100x slower in
            # this sandboxed container (measured 5.1s vs 33ms per 64 MB).
            grown = np.zeros(max(2 * len(self.buf), self.used + n), np.uint8)
            grown[: self.used] = self.buf[: self.used]
            self.buf = grown
        self.buf[self.used : self.used + n] = data
        self.used += n

    def view(self) -> np.ndarray:
        return self.buf[: self.used]


class PackedReads:
    """Columnar store of encoded reads, sliced into device batches."""

    def __init__(self, qual_offset: int = 33):
        self.qual_offset = qual_offset
        self._codes = _ByteStore()
        self._quals = _ByteStore()
        self._offsets = [0]
        self.names: list = []
        self.bases = 0
        self.max_read_len = 0

    def add_read(self, name: str, seq: str, quals: str):
        assert len(seq) == len(quals), (name, len(seq), len(quals))
        sb = np.frombuffer(seq.encode(), np.uint8)
        codes = _LUT[sb]
        if (codes == 255).any():
            bad = chr(sb[(codes == 255).argmax()])
            raise ValueError(f"illegal base character {bad!r} in {name}")
        self._codes.append(codes)
        self._quals.append(np.frombuffer(quals.encode(), np.uint8))
        self._offsets.append(self._offsets[-1] + len(seq))
        self.names.append(name)
        self.bases += len(seq)
        self.max_read_len = max(self.max_read_len, len(seq))

    def add_batch(self, names: list, seqs: list, quals: list):
        """Vectorized bulk add: one LUT pass over the chunk's concatenated
        bases instead of per-read numpy calls (the batched analogue of the
        reference's linear-allocator block fill, src/packed_reads.cpp:90-126;
        per-read add_read dominated ingest wall at ~55% before this)."""
        if not names:
            return
        # per-read length check (add_read's assert, kept vectorized): equal
        # chunk TOTALS are not enough — compensating mismatches would shift
        # every later read's quality bytes silently
        lens = np.fromiter(map(len, seqs), np.int64, count=len(seqs))
        qlens = np.fromiter(map(len, quals), np.int64, count=len(quals))
        if len(lens) != len(qlens) or (lens != qlens).any():
            i = int((lens != qlens).argmax()) if len(lens) == len(qlens) else 0
            raise ValueError(
                f"seq/qual length mismatch in {names[i]}: "
                f"{int(lens[i])} vs {int(qlens[i])}"
            )
        sjoin = "".join(seqs).encode()
        qjoin = "".join(quals).encode()
        codes = _LUT[np.frombuffer(sjoin, np.uint8)]
        if (codes == 255).any():
            pos = int((codes == 255).argmax())
            i = int(np.searchsorted(np.cumsum(lens), pos, side="right"))
            bad = chr(sjoin[pos])
            raise ValueError(f"illegal base character {bad!r} in {names[i]}")
        self._codes.append(codes)
        self._quals.append(np.frombuffer(qjoin, np.uint8))
        base = self._offsets[-1]
        self._offsets.extend((base + np.cumsum(lens)).tolist())
        self.names.extend(names)
        self.bases += int(lens.sum())
        if len(lens):
            self.max_read_len = max(self.max_read_len, int(lens.max()))

    def __len__(self):
        return len(self._offsets) - 1

    def lengths(self) -> np.ndarray:
        off = np.asarray(self._offsets, np.int64)
        return (off[1:] - off[:-1]).astype(np.int32)

    def get_read(self, i: int) -> tuple:
        """(name, seq, quals) — the get_next_read analogue for dumps."""
        lo, hi = self._offsets[i], self._offsets[i + 1]
        seq = "".join(_BASES[self._codes.view()[lo:hi]])
        quals = self._quals.view()[lo:hi].tobytes().decode()
        return self.names[i], seq, quals

    @property
    def seqs(self):
        """String views (test/debug convenience; O(total bases))."""
        return [self.get_read(i)[1] for i in range(len(self))]

    @property
    def quals(self):
        return [self.get_read(i)[2] for i in range(len(self))]

    def estimate_num_kmers(self, k: int, sample: int = 50000) -> int:
        """Sampled estimate like PackedReads::estimate_num_kmers
        (src/packed_reads.cpp:484-518)."""
        lens = self.lengths()[:sample]
        lens = lens[lens >= k]
        if len(lens) == 0:
            return 0
        n_kmers = int((lens - k + 1).sum())
        n_reads = len(lens)
        return n_kmers * len(self) // max(n_reads, 1)

    def slice_batch(self, lo: int, hi: int, max_len: int, pad_to: int | None = None) -> ReadBatch:
        """Vectorized [lo:hi) batch extraction from the columnar store."""
        off = np.asarray(self._offsets[lo : hi + 1], np.int64)
        lens = (off[1:] - off[:-1]).astype(np.int32)
        B = hi - lo
        rows = pad_to if pad_to is not None else B
        codes = host_full((rows, max_len), 4, np.uint8)
        badq = np.zeros((rows, max_len), bool)
        lengths = np.zeros((rows,), np.int32)
        lengths[:B] = np.minimum(lens, max_len)
        cview = self._codes.view()
        qview = self._quals.view()
        # gather: position j of row r = cview[off[r] + j] for j < len
        idx = off[:-1, None] + np.arange(max_len)[None, :]
        mask = np.arange(max_len)[None, :] < lengths[:B, None]
        idx = np.minimum(idx, len(cview) - 1)
        codes[:B] = np.where(mask, cview[idx], 4)
        thresh = self.qual_offset + KCOUNT_QUAL_CUTOFF
        badq[:B] = mask & (qview[idx] < thresh)
        return ReadBatch(codes=codes, badq=badq, lengths=lengths)

    def batches(self, batch_size: int, max_len: int | None = None, pad_batch: bool = True):
        """Yield ReadBatch chunks; short final batch zero-padded when
        pad_batch so every device step sees one static shape."""
        if max_len is None:
            max_len = max(self.max_read_len, 1)
        n = len(self)
        for lo in range(0, max(n, 1), batch_size):
            hi = min(lo + batch_size, n)
            yield self.slice_batch(
                lo, hi, max_len, pad_to=batch_size if pad_batch else None
            )


def encode_batch(
    seqs: list,
    quals: list,
    qual_offset: int = 33,
    max_len: int | None = None,
    pad_to: int | None = None,
) -> ReadBatch:
    """Vectorized encode of a list of (seq, quals) strings.

    Uses the native C++ kernel (io/native.py) when built — the host analogue
    of PackedRead's per-base packing loop (src/packed_reads.cpp:90-126)."""
    if max_len is None:
        max_len = max((len(s) for s in seqs), default=1)
    from .native import encode_reads_native

    nat = encode_reads_native(seqs, quals, qual_offset, max_len, pad_to) if seqs else None
    if nat is not None:
        codes, badq, lengths = nat
        return ReadBatch(codes=codes, badq=badq, lengths=lengths)
    B = len(seqs)
    rows = pad_to if pad_to is not None else B
    codes = host_full((rows, max_len), 4, np.uint8)
    badq = np.zeros((rows, max_len), bool)
    lengths = np.zeros((rows,), np.int32)
    thresh = qual_offset + KCOUNT_QUAL_CUTOFF
    for i, (s, q) in enumerate(zip(seqs, quals)):
        L = min(len(s), max_len)
        sb = np.frombuffer(s[:L].encode(), np.uint8)
        c = _LUT[sb]
        if (c == 255).any():
            bad = chr(sb[(c == 255).argmax()])
            raise ValueError(f"illegal base character {bad!r}")
        codes[i, :L] = c
        qb = np.frombuffer(q[:L].encode(), np.uint8)
        badq[i, :L] = qb < thresh
        lengths[i] = L
    return ReadBatch(codes=codes, badq=badq, lengths=lengths)
