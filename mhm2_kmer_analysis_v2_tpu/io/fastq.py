"""FASTQ ingest (host side).

Re-design of the reference's FastqReader (src/fastq.cpp:173-1251): partitioned
parallel reading with record-boundary repair, paired-file synchronization,
Illumina/HudsonAlpha header normalization, and deterministic subsampling.

On TPU pods the reads are CPU-fed, so this layer stays host-side numpy; the
per-rank byte-range partition maps to per-process (jax.process_index) blocks.
"""

from __future__ import annotations

import bisect
import gzip
import io
import itertools
import os
from dataclasses import dataclass


def is_gz(fname: str) -> bool:
    with open(fname, "rb") as f:
        return f.read(2) == b"\x1f\x8b"


def _open(fname: str):
    if is_gz(fname):
        return gzip.open(fname, "rb")
    return open(fname, "rb")


def get_fq_name(header: str) -> str:
    """Normalize a FASTQ header to 'name/1' or 'name/2'.

    Control-flow mirror of FastqReader::get_fq_name (src/fastq.cpp:77-135):
    classic '@name/1' passes through; HudsonAlpha '@pair-R1'/'@pair-R2'
    becomes 'pair/1'; Illumina 1.8+ '@name 1:N:0:...' becomes 'name/1';
    any other comment is stripped.
    """
    if not header.startswith("@"):
        raise ValueError(f"bad FASTQ header: {header!r}")
    header = header[1:].rstrip()
    n = len(header)
    if n >= 3 and header[n - 2] != "/":
        if header[n - 2] == "R":
            # HudsonAlpha: @pair-R1 / @pair-R2 -> pair/1, pair/2
            return header[: n - 3] + "/" + header[n - 1]
        end_pos = header.find("\t")
        if end_pos == -1:
            end_pos = header.find(" ")
            if end_pos == -1:
                return header
        if end_pos > 3 and header[end_pos - 2] == "/" and header[end_pos - 1] in "12":
            return header[:end_pos]
        if (
            n >= end_pos + 7
            and header[end_pos + 2] == ":"
            and header[end_pos + 4] == ":"
            and header[end_pos + 6] == ":"
            and header[end_pos + 1] in "12"
        ):
            return header[:end_pos] + "/" + header[end_pos + 1]
        return header[:end_pos]
    return header


@dataclass(slots=True)
class FastqRecord:
    name: str
    seq: str
    quals: str


class FastqReader:
    """Sequential FASTQ reader over an optional byte range with boundary repair.

    The byte-range start is repaired to the next record boundary the same way
    get_fptr_for_next_record does (src/fastq.cpp:284-512): scan for an '@'
    line whose +2 line is '+', with pair-aware disambiguation (a '@' quality
    line can masquerade as a header).  Reading continues past `end` until the
    record that contains it is finished, so concatenating all ranges yields
    exactly the file's records.
    """

    # bulk refill size: records are parsed from chunk.split(b"\n") instead
    # of four readline() calls each — the Python-level per-record overhead
    # was >50% of ingest wall (the C++ reference reads 16 MB blocks too,
    # src/fastq.hpp convention)
    _CHUNK = 4 << 20

    def __init__(self, fname: str, start: int = 0, end: int | None = None):
        self.fname = fname
        if is_gz(fname):
            # gzip streams are not block-splittable; only full-file reads
            if start != 0 or end is not None:
                raise ValueError("byte-range reads unsupported on gzip FASTQ")
            self.f = gzip.open(fname, "rb")
            self.end = None
        else:
            self.f = open(fname, "rb")
            size = os.fstat(self.f.fileno()).st_size
            self.end = size if end is None else min(end, size)
            if start > 0:
                self.f.seek(start)
                self._seek_next_record()
        # bulk line buffer: _lines[_li:] are the newline-stripped unconsumed
        # lines (list + consume index, not a deque — read_batch slices whole
        # record windows out of it); _pos is the file offset of the next
        # UNCONSUMED line, _read_pos of the next refill
        self._lines: list = []
        self._sizes: list = []
        self._li = 0
        self._pos = self.f.tell() if not is_gz(fname) else 0
        self._read_pos = self._pos
        # malformed-record error stashed by read_batch so already-assembled
        # records in the same call are returned first, not discarded
        self._pending_err: ValueError | None = None

    def _refill(self) -> bool:
        if self._li:
            del self._lines[: self._li]
            del self._sizes[: self._li]
            self._li = 0
        chunk = self.f.read(self._CHUNK)
        if not chunk:
            return False
        if not chunk.endswith(b"\n"):
            chunk += self.f.readline()  # complete the partial last line
        self._read_pos += len(chunk)
        parts = chunk.split(b"\n")
        last_complete = parts[-1] == b""
        if last_complete:
            parts.pop()
        self._lines.extend(parts)
        self._sizes.extend(len(p) + 1 for p in parts)
        if not last_complete:
            # EOF without trailing newline: the final line has no '\n' byte
            self._sizes[-1] -= 1
        return True

    def _seek_next_record(self):
        """Advance to the next record boundary (header line start)."""
        f = self.f
        # skip partial line
        f.readline()
        while True:
            pos = f.tell()
            lines = []
            probe = pos
            for _ in range(4):
                ln = f.readline()
                if not ln:
                    f.seek(pos)
                    return
                lines.append(ln)
            f.seek(pos)
            # a valid record start: '@' header and '+' two lines later, and
            # the sequence line is ACGTN-ish. The quality line of the previous
            # record can start with '@'; in that case lines[1] would be a
            # header and lines[3] would be '+' - prefer the interpretation
            # where line0 is the header (src/fastq.cpp:350-420).
            if lines[0].startswith(b"@") and lines[2].startswith(b"+") and _is_seq_line(lines[1]):
                return
            if lines[1].startswith(b"@") and lines[3].startswith(b"+") and _is_seq_line(lines[2]):
                f.seek(pos + len(lines[0]))
                return
            f.seek(pos + len(lines[0]))

    def __iter__(self):
        return self

    def __next__(self) -> FastqRecord:
        if self.end is not None and self._pos >= self.end:
            raise StopIteration
        try:
            return self._read_record()
        except OSError:
            # mid-read stream failure: reopen and reseek, like the
            # reopen-on-failure path at src/fastq.cpp:1086-1099; buffered
            # (already-read) lines are kept — the reopen resumes the REFILL
            # position, not the consume position
            self.f = open(self.fname, "rb")
            self.f.seek(self._read_pos)
            return self._read_record()

    def _read_record(self) -> FastqRecord:
        while len(self._lines) - self._li < 4:
            if not self._refill():
                break
        lines, sizes, li = self._lines, self._sizes, self._li
        avail = len(lines) - li
        if avail == 0:
            raise StopIteration
        header = lines[li]
        self._pos += sizes[li]
        if avail < 4:
            # truncated final record
            self._pos += sum(sizes[li + 1 :])
            self._li = len(lines)
            raise StopIteration
        seq = lines[li + 1]
        plus = lines[li + 2]
        quals = lines[li + 3]
        self._pos += sizes[li + 1] + sizes[li + 2] + sizes[li + 3]
        self._li = li + 4
        if not header.startswith(b"@") or not plus.startswith(b"+"):
            raise ValueError(
                f"malformed FASTQ record near byte {self._pos} in {self.fname}"
            )
        return FastqRecord(
            name=get_fq_name(header.decode()),
            seq=seq.decode().strip().upper(),
            quals=quals.decode(),
        )

    def read_batch(self, n: int) -> list[FastqRecord]:
        """Bulk-assemble up to n records — identical consumption semantics to
        iterating __next__ (byte-range end checked against each record's
        START offset), with the per-record Python overhead amortized: whole
        header/seq/qual line windows come out of the buffer as slices and the
        records are built in one comprehension.  This is the ingest hot path
        (the reference reads blockwise for the same reason, src/fastq.hpp).

        A malformed record mid-batch does not discard the good records already
        assembled: they are returned and the ValueError re-raised on the NEXT
        call, so callers that consume batch-by-batch never lose records."""
        if self._pending_err is not None:
            err, self._pending_err = self._pending_err, None
            raise err
        out: list[FastqRecord] = []
        while len(out) < n:
            if self.end is not None and self._pos >= self.end:
                break
            avail = (len(self._lines) - self._li) // 4
            if avail == 0:
                # slow path owns refill, truncation, malformed-record errors
                # and the reopen-on-failure retry
                try:
                    out.append(next(self))
                except StopIteration:
                    break
                except ValueError as e:
                    if not out:
                        raise
                    self._pending_err = e
                    break
                continue
            take = min(n - len(out), avail)
            li, lines, sizes = self._li, self._lines, self._sizes
            cum = list(itertools.accumulate(sizes[li : li + 4 * take]))
            if self.end is not None:
                # record r starts at _pos + cum[4r-1]; keep records whose
                # start precedes `end`, exactly like the per-record check
                take = min(
                    take, 1 + bisect.bisect_left(cum[3::4], self.end - self._pos)
                )
            hdrs = lines[li : li + 4 * take : 4]
            pluses = lines[li + 2 : li + 4 * take : 4]
            if not all(h[:1] == b"@" for h in hdrs) or not all(
                p[:1] == b"+" for p in pluses
            ):
                # malformed record in the window: let the per-record path
                # consume up to it and raise with the exact byte position
                try:
                    out.append(next(self))
                except StopIteration:
                    break
                except ValueError as e:
                    if not out:
                        raise
                    self._pending_err = e
                    break
                continue
            seqs = lines[li + 1 : li + 4 * take : 4]
            qls = lines[li + 3 : li + 4 * take : 4]
            self._pos += cum[4 * take - 1]
            self._li = li + 4 * take
            out.extend(
                FastqRecord(get_fq_name(h.decode()), s.decode().strip().upper(), q.decode())
                for h, s, q in zip(hdrs, seqs, qls)
            )
        return out

    def tell(self) -> int:
        """File offset of the next unconsumed record (logical position — the
        underlying handle reads ahead in bulk)."""
        return self._pos

    def jump(self, pos: int):
        """Reposition to an exact record boundary, dropping buffered lines."""
        self.f.seek(pos)
        self._lines.clear()
        self._sizes.clear()
        self._li = 0
        self._pos = pos
        self._read_pos = pos
        self._pending_err = None

    def close(self):
        self.f.close()


def iter_batched(rdr: FastqReader, batch: int = 4096):
    """Iterate a FastqReader through read_batch (bulk record assembly) —
    drop-in replacement for iter(rdr) on hot paths."""
    while True:
        recs = rdr.read_batch(batch)
        if not recs:
            return
        yield from recs


def _is_seq_line(ln: bytes) -> bool:
    sample = ln.strip()[:64]
    if not sample:
        return False
    ok = sum(1 for c in sample if c in b"ACGTNacgtn")
    return ok >= len(sample) * 0.9


_LEGAL_BASES = set("ACGTacgtNnUuRrYyKkMmSsWwBbDdHhVv")


def check_is_fastq(fname: str, num_records: int = 10):
    """Up-front input validation — the check_is_fastq analogue
    (src/fastq.cpp:173-282): the first records must be structurally valid
    FASTQ (@header / sequence / + / equal-length quality, legal base
    characters).  Raises ValueError with a precise message so malformed
    input fails BEFORE ingest instead of mid-run."""
    f = _open(fname)
    try:
        for i in range(num_records):
            header = f.readline()
            if not header:
                if i == 0:
                    raise ValueError(f"{fname}: empty file, not FASTQ")
                return
            seq = f.readline()
            plus = f.readline()
            quals = f.readline()
            if not header.startswith(b"@"):
                raise ValueError(
                    f"{fname}: record {i}: header does not start with '@': "
                    f"{header[:40]!r}"
                )
            if not plus.startswith(b"+"):
                raise ValueError(
                    f"{fname}: record {i}: separator line is not '+': "
                    f"{plus[:40]!r} (is this a FASTA file?)"
                )
            s = seq.strip()
            q = quals.rstrip(b"\n")
            if not quals:
                raise ValueError(f"{fname}: record {i}: truncated record")
            if len(s) != len(q):
                raise ValueError(
                    f"{fname}: record {i}: sequence length {len(s)} != "
                    f"quality length {len(q)}"
                )
            bad = [chr(c) for c in s if chr(c) not in _LEGAL_BASES]
            if bad:
                raise ValueError(
                    f"{fname}: record {i}: illegal base character {bad[0]!r}"
                )
    finally:
        f.close()


def estimate_num_reads(fname: str, n_samples: int = 7, sample_records: int = 64) -> int:
    """Estimated record count from sampled byte ranges — the
    estimate_num_reads analogue (src/merge_reads.cpp:84-192, ~7 sampling
    ranks).  gzip inputs assume a 3x compression ratio like the reference's
    file-size heuristics (src/main.cpp:139-151)."""
    size = os.path.getsize(fname)
    if size == 0:
        return 0
    gz = is_gz(fname)
    if gz:
        # sample the head of the stream only (no random access into gzip)
        f = gzip.open(fname, "rb")
        tot_bytes = tot_recs = 0
        for _ in range(n_samples * sample_records):
            rec = [f.readline() for _ in range(4)]
            if not rec[3]:
                break
            tot_bytes += sum(len(ln) for ln in rec)
            tot_recs += 1
        f.close()
        if not tot_recs:
            return 0
        return int(size * 3.0 / (tot_bytes / tot_recs))
    tot_bytes = tot_recs = 0
    for s in range(n_samples):
        start = size * s // n_samples
        rdr = FastqReader(fname, start=start, end=size)
        for _ in range(sample_records):
            pos0 = rdr.tell()
            try:
                next(rdr)
            except (StopIteration, ValueError):
                break
            tot_bytes += rdr.tell() - pos0
            tot_recs += 1
        rdr.close()
    if not tot_recs:
        return 0
    return int(size / (tot_bytes / tot_recs))


def read_fastq(fname: str, subsample_pct: int = 100) -> list[FastqRecord]:
    """Read a whole FASTQ file; deterministic modulo subsampling like
    get_next_fq_record's modulo logic (src/fastq.cpp:1034-1059)."""
    out = []
    keep_mod = 100
    rdr = FastqReader(fname)
    for i, rec in enumerate(iter_batched(rdr)):
        if subsample_pct < 100 and (i % keep_mod) >= subsample_pct:
            continue
        out.append(rec)
    rdr.close()
    return out


def read_fastq_block(fname: str, rank: int, n_ranks: int, pair_aware: bool = False):
    """STREAM this rank's records of the per-rank even byte-range split with
    boundary repair (continue_open_default_per_rank_boundaries,
    src/fastq.cpp:810-892).  A bounded generator — records are never
    materialized as a whole block (the reference streams per rank too,
    src/fastq.cpp:1028-1059); reference-scale blocks are GBs.

    With pair_aware (interleaved paired files), blocks are additionally
    aligned to PAIR boundaries: a block whose first record is a '/2' mate
    skips it (the previous block consumed that pair — the reference resolves
    this with the paired-read disambiguation in get_fptr_for_next_record,
    src/fastq.cpp:284-512, and RPC hand-off of boundaries).

    gzip inputs are not byte-splittable: every rank streams the whole file
    once and keeps its round-robin slice of fixed record chunks (pair-sized
    when pair_aware) — bounded memory, deterministic union of all ranks.
    """
    if is_gz(fname):
        yield from _gz_round_robin(fname, rank, n_ranks, chunk=8192)
        return
    size = os.path.getsize(fname)
    start = size * rank // n_ranks
    end = size * (rank + 1) // n_ranks
    rdr = FastqReader(fname, start=start, end=end)
    first = True
    last: FastqRecord | None = None
    while True:
        recs = rdr.read_batch(4096)
        if not recs:
            break
        if first and pair_aware and start > 0 and recs[0].name.endswith("/2"):
            recs = recs[1:]  # belongs to the previous block's pair
        first = False
        if recs:
            last = recs[-1]
            yield from recs
    # pair-aware blocks read one extra record when their last record starts a
    # pair whose mate lies beyond `end`
    if pair_aware and last is not None and last.name.endswith("/1") and end < size:
        pos = rdr.tell()
        peek = FastqReader(fname)  # start=0: no boundary seek
        peek.jump(pos)
        try:
            mate = next(peek)
        except (StopIteration, ValueError):
            mate = None
        peek.close()
        if mate is not None and mate.name[:-1] == last.name[:-1]:
            yield mate
    rdr.close()


def _gz_round_robin(fname: str, rank: int, n_ranks: int, chunk: int):
    """Round-robin record-chunk split of a gzip stream (chunk stays even so
    interleaved pairs never straddle a chunk boundary)."""
    rdr = FastqReader(fname)
    ci = 0
    while True:
        recs = rdr.read_batch(chunk)
        if not recs:
            break
        if ci % n_ranks == rank:
            yield from recs
        ci += 1
    rdr.close()


def _name_base(name: str) -> str:
    return name[:-1] if name.endswith(("1", "2")) and "/" in name else name


def iter_paired_blocks(fname1: str, fname2: str, rank: int, n_ranks: int):
    """STREAM this rank's pairs of a TWO-FILE group with index
    synchronization — the set_matching_pair analogue (src/fastq.cpp:619-742).

    Each rank takes its proportional byte-range block of FILE 1.  File 2's
    reader starts at the proportional offset minus a slack margin and scans
    forward until it finds the mate of block 1's first record; the two
    streams then advance in lockstep with NAME-BASED resync: a record whose
    mate is missing from the other file gets a fake 1-base mate (the
    reference's missing-mate behavior, src/merge_reads.cpp:407-462) instead
    of silently truncating to the shorter stream.  Block 1's record count
    paces the block (plus any unpaired file-2 records interleaved between its
    mates).

    Bounded memory: both files stream; nothing is materialized.
    """
    if is_gz(fname1) or is_gz(fname2):
        # gzip is not byte-splittable: both ranks stream both files once and
        # keep round-robin PAIR chunks (bounded memory)
        it1 = iter(_gz_round_robin(fname1, rank, n_ranks, chunk=4096))
        it2 = iter(_gz_round_robin(fname2, rank, n_ranks, chunk=4096))
        yield from _zip_resync(it1, it2)
        return

    size1 = os.path.getsize(fname1)
    start = size1 * rank // n_ranks
    end = size1 * (rank + 1) // n_ranks
    rdr1 = FastqReader(fname1, start=start, end=end)
    try:
        first1 = next(rdr1)
    except StopIteration:
        rdr1.close()
        return
    want_base = _name_base(first1.name)

    size2 = os.path.getsize(fname2)
    approx = size2 * rank // n_ranks
    slack = max(65536, size2 // max(n_ranks * 8, 1))
    rdr2 = None
    while True:
        s2 = max(0, approx - slack)
        rdr2 = FastqReader(fname2, start=s2, end=None)
        found = None
        for rec in rdr2:
            if _name_base(rec.name) == want_base:
                found = rec
                break
            if rdr2.tell() > approx + slack and s2 > 0:
                break  # overshot the window: mate must be before s2
        if found is not None:
            break
        rdr2.close()
        rdr2 = None
        if s2 == 0:
            raise ValueError(
                f"iter_paired_blocks: mate of {first1.name!r} not found in {fname2}"
            )
        slack *= 4

    def stream1():
        yield first1
        yield from iter_batched(rdr1)

    def stream2():
        yield found
        yield from iter_batched(rdr2)

    yield from _zip_resync(stream1(), stream2(), pace_first=True)
    rdr1.close()
    rdr2.close()


def _zip_resync(it1, it2, pace_first: bool = False):
    """Zip two record streams into pairs with name-based missing-mate resync
    (fake 1-base mates, ≡ the interleaved resync of merge_reads.cpp:407-462).
    With pace_first, stream 2 stops contributing once stream 1 is exhausted
    (its remaining records belong to the next rank's block)."""
    p1 = p2 = None
    while True:
        r1 = p1 if p1 is not None else _next_or_none(it1)
        r2 = p2 if p2 is not None else _next_or_none(it2)
        p1 = p2 = None
        if r1 is None and r2 is None:
            return
        if r1 is None:
            if pace_first:
                return
            yield _fake_mate(r2, "1"), r2
            continue
        if r2 is None:
            yield r1, _fake_mate(r1, "2")
            continue
        b1, b2 = _name_base(r1.name), _name_base(r2.name)
        if b1 == b2:
            yield r1, r2
            continue
        # streams desynced: peek one ahead on each side to decide which
        # stream skipped a record
        n1 = _next_or_none(it1)
        if n1 is not None and _name_base(n1.name) == b2:
            # file 1 has an extra record (its mate missing in file 2)
            yield r1, _fake_mate(r1, "2")
            yield n1, r2
            continue
        n2 = _next_or_none(it2)
        if n2 is not None and _name_base(n2.name) == b1:
            # file 2 has an extra record
            yield _fake_mate(r2, "1"), r2
            yield r1, n2
            p1 = n1
            continue
        # unrelated records on both sides: emit each with a fake mate
        yield r1, _fake_mate(r1, "2")
        yield _fake_mate(r2, "1"), r2
        p1, p2 = n1, n2


def _next_or_none(it):
    try:
        return next(it)
    except StopIteration:
        return None


def _fake_mate(rec: FastqRecord, suffix: str) -> FastqRecord:
    base = _name_base(rec.name)
    name = base + suffix if base.endswith("/") else base + "/" + suffix
    return FastqRecord(name=name, seq="N", quals="!")


def read_paired_blocks(fname1: str, fname2: str, rank: int, n_ranks: int) -> tuple:
    """Materialized form of iter_paired_blocks (kept for tests/small inputs);
    the ingest path streams via iter_paired_blocks."""
    b1, b2 = [], []
    for r1, r2 in iter_paired_blocks(fname1, fname2, rank, n_ranks):
        b1.append(r1)
        b2.append(r2)
    return b1, b2


def iter_paired(fnames: list[str]):
    """Yield read pairs from either one interleaved file or two paired files
    (the reference's 'f1:f2' vs interleaved '-r' conventions,
    src/options.cpp:379-405).  Two-file streams resync on a missing mate via
    fake 1-base mates (src/merge_reads.cpp:407-462) instead of truncating to
    the shorter stream."""
    if len(fnames) == 2:
        r1 = FastqReader(fnames[0])
        r2 = FastqReader(fnames[1])
        yield from _zip_resync(iter_batched(r1), iter_batched(r2))
        r1.close()
        r2.close()
    else:
        (fname,) = fnames
        rdr = FastqReader(fname)
        it = iter_batched(rdr)
        while True:
            try:
                a = next(it)
                b = next(it)
            except StopIteration:
                break
            yield a, b
        rdr.close()
