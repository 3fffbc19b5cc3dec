"""Ingest stage: FASTQ -> adapter trim -> pair merge -> PackedReads.

The merge_reads() orchestration (src/merge_reads.cpp:250-771) re-designed for
the single-controller pipeline: per read group, stream records, normalize
names, pair them up (robust to a missing mate via the /1 /2 suffix resync of
merge_reads.cpp:407-462), adapter-trim pairs, attempt the overlap merge, and
emit PackedReads where mate 2 of a merged/unpaired read is the "N"
placeholder with a single qual_offset quality char (read-id parity encodes
pair-ness, merge_reads.cpp:650).
"""

from __future__ import annotations

from .adapters import Adapters
from .fastq import FastqReader, iter_paired
from .merge_reads import MergeStats, merge_pair
from .packed_reads import PackedReads
from ..utils.logging import slog_verbose


def ingest_group(
    fnames: list,
    pr: PackedReads,
    adapters: Adapters,
    *,
    qual_offset: int = 33,
    min_kmer_len: int = 21,
    do_merge: bool = True,
    paired: bool = True,
    stats: MergeStats | None = None,
    start_read_id: int = 0,
    subsample_pct: int = 100,
) -> int:
    """Ingest one read group (one interleaved/unpaired file or a 2-file pair)
    into `pr`.  Returns the next read id."""
    fake_qual = chr(qual_offset)
    read_id = start_read_id
    if stats is None:
        stats = MergeStats()

    if not paired:
        # unpaired files: no trim, no merge — dummy mate 2
        # (merge_reads.cpp:364-384); multi-process: this process's byte-range
        # block only (src/fastq.cpp:810-892)
        from ..parallel.distributed import my_read_block

        names, seqs, quals = [], [], []
        for i, rec in enumerate(my_read_block(fnames[0], paired=False)):
            if subsample_pct < 100 and (i % 100) >= subsample_pct:
                continue
            names.extend((f"r{read_id}/1", f"r{read_id}/2"))
            seqs.extend((rec.seq, "N"))
            quals.extend((rec.quals, fake_qual))
            read_id += 2
            if len(names) >= 8192:
                pr.add_batch(names, seqs, quals)
                names, seqs, quals = [], [], []
        pr.add_batch(names, seqs, quals)
        return read_id

    # pairs are processed in CHUNKS so the whole merge scan for a chunk is
    # ONE native call (amortizing the call boundary, the batched analogue of
    # the reference's per-rank tight C++ loop, merge_reads.cpp:250-771);
    # emission order is preserved exactly
    CHUNK = 4096
    chunk: list = []  # (seq1, quals1, seq2, quals2, attempt_merge)
    out_names: list = []  # bulk-added once per chunk (add_batch)
    out_seqs: list = []
    out_quals: list = []

    def emit(seq1, quals1, seq2, quals2, merged, mseq, mquals):
        nonlocal read_id
        if merged:
            out_seqs.extend((mseq, "N"))
            out_quals.extend((mquals, fake_qual))
        else:
            out_seqs.extend((seq1, seq2))
            out_quals.extend((quals1, quals2))
        out_names.extend((f"r{read_id}/1", f"r{read_id}/2"))
        read_id += 2

    def flush():
        from .native import merge_chunk_native

        todo = [c for c in chunk if c[4]]
        res = merge_chunk_native(
            [c[0] for c in todo], [c[1] for c in todo],
            [c[2] for c in todo], [c[3] for c in todo], qual_offset,
        ) if todo else (None, [])
        if res is None:
            # library unavailable: per-pair path
            for s1, q1, s2, q2, attempt in chunk:
                merged = False
                mseq = mquals = None
                if attempt:
                    merged, mseq, mquals = merge_pair(s1, q1, s2, q2, qual_offset, stats)
                emit(s1, q1, s2, q2, merged, mseq, mquals)
            chunk.clear()
            _drain()
            return
        statuses, merged_out = res
        ti = 0
        for s1, q1, s2, q2, attempt in chunk:
            if not attempt:
                emit(s1, q1, s2, q2, False, None, None)
                continue
            st, m = int(statuses[ti]), merged_out[ti]
            ti += 1
            if st == -4:
                # exact scalar path (N/IUPAC/oversized); it does its own stats
                merged, mseq, mquals = merge_pair(s1, q1, s2, q2, qual_offset, stats)
                emit(s1, q1, s2, q2, merged, mseq, mquals)
                continue
            stats.num_pairs += 1
            if st > 0:
                mseq, mquals = m
                stats.num_merged += 1
                stats.merged_len += st
                stats.overlap_len += len(s1) + len(s2) - st
                emit(s1, q1, s2, q2, True, mseq, mquals)
            else:
                if st == -2:
                    stats.num_ambiguous += 1
                emit(s1, q1, s2, q2, False, None, None)
        chunk.clear()
        _drain()

    def _drain():
        pr.add_batch(out_names, out_seqs, out_quals)
        out_names.clear()
        out_seqs.clear()
        out_quals.clear()

    for pair_idx, (rec1, rec2) in enumerate(_iter_pairs_robust(fnames)):
        # deterministic pair-level subsampling (src/fastq.cpp:1034-1059)
        if subsample_pct < 100 and (pair_idx % 100) >= subsample_pct:
            continue
        seq1, quals1 = rec1.seq, rec1.quals
        seq2, quals2 = rec2.seq, rec2.quals
        _, seq1, quals1, seq2, quals2 = adapters.trim_pair(
            rec1.name, seq1, quals1, rec2.name, seq2, quals2
        )
        # drop pairs where both mates got too short (merge_reads.cpp:475)
        if len(seq1) < min_kmer_len and len(seq2) < min_kmer_len:
            continue
        attempt = do_merge and len(seq1) > 0 and len(seq2) > 0
        chunk.append((seq1, quals1, seq2, quals2, attempt))
        if len(chunk) >= CHUNK:
            flush()
    flush()
    return read_id


def _iter_pairs_robust(fnames: list):
    """Pair stream for one read group.  Two-file groups: index-aligned zip
    (multi-process: synchronized byte-range blocks, the set_matching_pair
    analogue at src/fastq.cpp:619-742).  Interleaved: robust to a missing
    mate via the /1 /2 resync of merge_reads.cpp:407-462."""
    import jax

    n_proc = jax.process_count()
    if len(fnames) == 2:
        if n_proc == 1:
            yield from iter_paired(fnames)
        else:
            from .fastq import iter_paired_blocks

            yield from iter_paired_blocks(
                fnames[0], fnames[1], jax.process_index(), n_proc
            )
        return
    if n_proc == 1:
        from .fastq import iter_batched

        it = iter_batched(FastqReader(fnames[0]))
    else:
        from ..parallel.distributed import my_read_block

        it = iter(my_read_block(fnames[0], paired=True))
    yield from _pairs_from_stream(it)


def _pairs_from_stream(it):
    from .fastq import FastqRecord

    pending = None
    while True:
        rec1 = pending if pending is not None else _next(it)
        pending = None
        if rec1 is None:
            break
        if rec1.name.endswith("/2"):
            # missing read 1: fake it (merge_reads.cpp:407-424)
            fake = FastqRecord(name=rec1.name[:-1] + "1", seq="N", quals="!")
            yield fake, rec1
            continue
        rec2 = _next(it)
        if rec2 is None:
            # missing mate at EOF: fake read 2
            yield rec1, FastqRecord(name=rec1.name[:-1] + "2", seq="N", quals="!")
            break
        if rec2.name.endswith("/2") and rec2.name[:-1] == rec1.name[:-1]:
            yield rec1, rec2
        else:
            # missing read 2: fake it, keep rec2 for the next round
            # (merge_reads.cpp:442-462)
            yield rec1, FastqRecord(name=rec1.name[:-1] + "2", seq="N", quals="!")
            pending = rec2


def _next(it):
    try:
        return next(it)
    except StopIteration:
        return None


def get_merged_reads_fname(fname: str, output_dir: str) -> str:
    """Name of the post-merge FASTQ checkpoint (analogue of
    get_merged_reads_fname, src/merge_reads.cpp:335-340)."""
    import os

    base = os.path.basename(fname).replace(".gz", "").replace(".fastq", "").replace(".fq", "")
    return os.path.join(output_dir, f"{base}-merged.fastq.gz")


def dump_merged(pr: PackedReads, lo: int, hi: int, path: str):
    """Persist merged reads [lo:hi) for restart (--dump-merged; the full MHM2
    uses this to skip the merge on restart)."""
    import gzip

    with gzip.open(path, "wt") as f:
        for i in range(lo, hi):
            name, seq, quals = pr.get_read(i)
            f.write(f"@{name}\n{seq}\n+\n{quals}\n")


def load_and_merge_reads(options) -> tuple:
    """Full ingest per the Options: returns (PackedReads, MergeStats).

    With --dump-merged, post-merge reads are checkpointed per input group;
    a --restart run with checkpoints present skips trim+merge entirely
    (stage-granularity restart, src/mhm2.py:871-937 / merge_reads.cpp:335-340).
    """
    import os

    pr = PackedReads(qual_offset=options.qual_offset)
    adapters = Adapters(
        fname=options.adapter_fname if options.adapter_trim else "",
        use_blastn_scores=(options.optimize_for == "contiguity"),
    )
    stats = MergeStats()
    read_id = 0
    min_k = min(options.kmer_lens)
    import jax

    rank, n_proc = jax.process_index(), jax.process_count()
    for group in options.all_read_groups():
        is_unpaired = any(group[0] == f.rstrip(":") for f in options.unpaired_fnames)
        ckpt = get_merged_reads_fname(group[0], options.output_dir)
        if n_proc > 1:
            # each process checkpoints its own byte-range block; the process
            # count is part of the name so a --restart under a DIFFERENT
            # world size never loads misaligned blocks (it re-ingests its own
            # byte range instead of double-counting/dropping reads)
            ckpt += f".{rank}of{n_proc}"
        if getattr(options, "restart", False) and os.path.exists(ckpt):
            slog_verbose("Restart: loading merged reads from ", ckpt)
            rdr = FastqReader(ckpt)
            names, seqs, quals = [], [], []
            for rec in rdr:
                names.append(rec.name)
                seqs.append(rec.seq)
                quals.append(rec.quals)
                if len(names) >= 8192:
                    pr.add_batch(names, seqs, quals)
                    names, seqs, quals = [], [], []
            pr.add_batch(names, seqs, quals)
            rdr.close()
            continue
        lo = len(pr)
        read_id = ingest_group(
            group,
            pr,
            adapters,
            qual_offset=options.qual_offset,
            min_kmer_len=min_k,
            paired=not is_unpaired,
            stats=stats,
            start_read_id=read_id,
            subsample_pct=options.subsample_fastq_pct,
        )
        if options.dump_merged:
            dump_merged(pr, lo, len(pr), ckpt)
    if stats.num_pairs:
        slog_verbose(
            "Merged ", stats.num_merged, " of ", stats.num_pairs, " pairs (",
            stats.num_ambiguous, " ambiguous)",
        )
    a = adapters.stats()
    if a["bases_trimmed"]:
        slog_verbose(
            "Adapter trimming: bases trimmed ", a["bases_trimmed"],
            ", reads removed ", a["reads_removed"],
        )
    return pr, stats
