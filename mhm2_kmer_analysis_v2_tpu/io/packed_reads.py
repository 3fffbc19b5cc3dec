"""Packed read batches: host-side encoding into fixed-shape device arrays.

Re-design of PackedReads (src/packed_reads.{hpp,cpp}): the reference packs
1 byte/base = 3-bit nucleotide + 5-bit capped quality into per-read heap
blocks; on TPU the natural form is fixed-shape [B, Lmax] arrays:

  codes: uint8 base code 0-3=ACGT, 4=N (IUPAC -> N, packed_reads.cpp:99-126)
  badq:  bool, quality < qual_offset + KCOUNT_QUAL_CUTOFF(=20) — this is the
         explicit bit-plane replacing the reference's lowercase-letter marking
         (src/kcount/kcount.cpp:80-85)
  lengths: int32

Qualities are capped at qual_offset+31 like the 5-bit packing
(src/packed_reads.cpp:126); only the <20 threshold is ever consumed
downstream, so the bit-plane is lossless for the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

KCOUNT_QUAL_CUTOFF = 20  # CMakeDefinitions.txt:58

# ASCII -> code lookup: ACGT -> 0..3, N/IUPAC -> 4, everything else -> 255
_LUT = np.full(256, 255, np.uint8)
for i, c in enumerate("ACGT"):
    _LUT[ord(c)] = i
    _LUT[ord(c.lower())] = i
for c in "NURYKMSWBDHV":
    _LUT[ord(c)] = 4
    _LUT[ord(c.lower())] = 4


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


@dataclass
class PackedReads:
    """Growable store of encoded reads, sliced into device batches."""

    qual_offset: int = 33
    seqs: list = field(default_factory=list)
    quals: list = field(default_factory=list)
    names: list = field(default_factory=list)
    bases: int = 0
    max_read_len: int = 0

    def add_read(self, name: str, seq: str, quals: str):
        assert len(seq) == len(quals), (name, len(seq), len(quals))
        self.names.append(name)
        self.seqs.append(seq)
        self.quals.append(quals)
        self.bases += len(seq)
        self.max_read_len = max(self.max_read_len, len(seq))

    def __len__(self):
        return len(self.seqs)

    def estimate_num_kmers(self, k: int, sample: int = 50000) -> int:
        """Sampled estimate like PackedReads::estimate_num_kmers
        (src/packed_reads.cpp:484-518)."""
        n_kmers = n_reads = 0
        for seq in self.seqs[:sample]:
            if len(seq) < k:
                continue
            n_kmers += len(seq) - k + 1
            n_reads += 1
        if n_reads == 0:
            return 0
        return n_kmers * len(self.seqs) // max(n_reads, 1)

    def batches(self, batch_size: int, max_len: int | None = None, pad_batch: bool = True):
        """Yield ReadBatch chunks; short final batch zero-padded when
        pad_batch so every device step sees one static shape."""
        if max_len is None:
            max_len = max(self.max_read_len, 1)
        n = len(self.seqs)
        for lo in range(0, max(n, 1), batch_size):
            chunk_seqs = self.seqs[lo : lo + batch_size]
            chunk_quals = self.quals[lo : lo + batch_size]
            yield encode_batch(
                chunk_seqs,
                chunk_quals,
                self.qual_offset,
                max_len=max_len,
                pad_to=batch_size if pad_batch else None,
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
    if max_len is None:
        max_len = max((len(s) for s in seqs), default=1)
    codes = np.full((rows, max_len), 4, np.uint8)
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
