"""ctypes bindings for the native host kernels (native/kmer_native.cpp).

Builds the shared library on first use if a compiler is available; every
caller has a pure-Python fallback so the framework runs without it (the
native path is the production host-ingest speed tier, mirroring the
reference's C++/SIMD host loops)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils.hostmem import host_full

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "kmer_native.cpp")
_SO = os.path.join(_REPO, "native", "libkmer_native.so")

_lib = None
_tried = False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not os.path.exists(_SRC):
            return None
        built = False
        for extra in (["-fopenmp"], []):  # fall back if OpenMP is unavailable
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", *extra,
                     "-o", _SO + ".tmp", _SRC],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(_SO + ".tmp", _SO)
                built = True
                break
            except Exception:
                continue
        if not built:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.knat_count_mismatches.restype = ctypes.c_int32
    lib.knat_count_mismatches.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.knat_encode_reads.restype = ctypes.c_int32
    lib.knat_encode_reads.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.knat_merge_scan.restype = ctypes.c_int32
    lib.knat_merge_scan.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.knat_merge_pair.restype = ctypes.c_int32
    lib.knat_merge_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.knat_revcomp.restype = ctypes.c_int32
    lib.knat_revcomp.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
    ]
    lib.knat_finish_merge.restype = ctypes.c_int32
    lib.knat_finish_merge.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    if hasattr(lib, "knat_merge_chunk"):
        lib.knat_merge_chunk.restype = None
        lib.knat_merge_chunk.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
    if hasattr(lib, "knat_format_dump"):
        lib.knat_format_dump.restype = ctypes.c_int64
        lib.knat_format_dump.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p,
        ]
    if hasattr(lib, "knat_adapters_build"):
        lib.knat_adapters_build.restype = ctypes.c_void_p
        lib.knat_adapters_build.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.knat_adapters_free.restype = None
        lib.knat_adapters_free.argtypes = [ctypes.c_void_p]
        lib.knat_adapters_trim.restype = ctypes.c_int32
        lib.knat_adapters_trim.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
        ]
    _lib = lib
    return _lib


def adapters_build_native(seqs: list, k: int, match: int, mismatch: int,
                          gap_open: int, gap_ext: int):
    """Build the native adapter index; returns an opaque handle or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "knat_adapters_build"):
        return None
    concat = "".join(seqs).encode()
    offsets = np.zeros(len(seqs) + 1, np.int64)
    offsets[1:] = np.cumsum([len(s) for s in seqs])
    handle = lib.knat_adapters_build(
        concat, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs), k, match, mismatch, gap_open, gap_ext,
    )
    return handle or None


def adapters_free_native(handle):
    lib = get_lib()
    if lib is not None and handle:
        lib.knat_adapters_free(handle)


def adapters_trim_native(handle, seq: str):
    """Native SSW-path trim scan: trim position, or -1 for no trim."""
    return _lib.knat_adapters_trim(handle, seq.encode(), len(seq))


def format_dump_native(codes: np.ndarray, counts: np.ndarray,
                       left: np.ndarray, right: np.ndarray):
    """Format 'KMER count L R' dump lines from a [n, k] 2-bit code plane in
    one native call; returns the text as bytes, or None (Python fallback)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "knat_format_dump"):
        return None
    n, k = codes.shape
    codes = np.ascontiguousarray(codes, np.uint8)
    counts32 = np.ascontiguousarray(counts, np.uint32)
    lb = np.asarray(left).astype("S1").tobytes()
    rb = np.asarray(right).astype("S1").tobytes()
    if len(lb) != n or len(rb) != n:
        return None
    out = ctypes.create_string_buffer(n * (k + 14) if n else 1)
    wrote = lib.knat_format_dump(
        _u8ptr(codes), n, k,
        counts32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), lb, rb, out,
    )
    return out.raw[:wrote]


_MERGE_BUF_S = ctypes.create_string_buffer(1 << 17)
_MERGE_BUF_Q = ctypes.create_string_buffer(1 << 17)


def merge_chunk_native(seqs1: list, quals1: list, seqs2: list, quals2: list,
                       qual_offset: int):
    """Merge a whole chunk of pairs in ONE native call.

    Returns (statuses int32[n], merged list where statuses[i] > 0 holds
    (seq, quals) and others hold None), or None when the library is
    unavailable.  Status -4 lanes need the caller's exact scalar fallback;
    -3 raises like merge_pair_native."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "knat_merge_chunk"):
        return None
    n = len(seqs1)
    if n == 0:
        return np.zeros(0, np.int32), []
    b1 = "".join(seqs1).encode()
    q1 = "".join(quals1).encode()
    b2 = "".join(seqs2).encode()
    q2 = "".join(quals2).encode()
    off1 = np.zeros(n + 1, np.int64)
    off1[1:] = np.cumsum([len(s) for s in seqs1])
    off2 = np.zeros(n + 1, np.int64)
    off2[1:] = np.cumsum([len(s) for s in seqs2])
    oout = np.zeros(n + 1, np.int64)
    oout[1:] = np.cumsum(off1[1:] - off1[:-1] + off2[1:] - off2[:-1])
    out_s = ctypes.create_string_buffer(int(oout[-1]) + 1)
    out_q = ctypes.create_string_buffer(int(oout[-1]) + 1)
    statuses = np.zeros(n, np.int32)
    lib.knat_merge_chunk(
        b1, q1, off1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b2, q2, off2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, qual_offset, out_s, out_q,
        oout.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if (statuses == -3).any():
        raise ValueError("Invalid quality score (phred offset mismatch?)")
    raw_s, raw_q = out_s.raw, out_q.raw
    merged = [
        (raw_s[oout[i] : oout[i] + st].decode(), raw_q[oout[i] : oout[i] + st].decode())
        if st > 0 else None
        for i, st in enumerate(statuses)
    ]
    return statuses, merged


def merge_pair_native(seq1: str, quals1: str, seq2: str, quals2: str, qual_offset: int):
    """Whole-pair merge in one native call.

    Returns (status, seq, quals): status 1 merged, 0 not merged, -2 ambiguous;
    None when the library is unavailable or the pair needs the exact Python
    N path; raises on invalid quality."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.knat_merge_pair(
        seq1.encode(), quals1.encode(), len(seq1),
        seq2.encode(), quals2.encode(), len(seq2),
        qual_offset, _MERGE_BUF_S, _MERGE_BUF_Q,
    )
    if n == -4:
        return None  # N present or oversized: exact scalar fallback
    if n == -3:
        raise ValueError("Invalid quality score (phred offset mismatch?)")
    if n == -2:
        return (-2, None, None)
    if n == 0:
        return (0, None, None)
    return (1, _MERGE_BUF_S.raw[:n].decode(), _MERGE_BUF_Q.raw[:n].decode())


def revcomp_native(seq: str):
    """Native reverse complement; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(seq)
    out = ctypes.create_string_buffer(n)
    rc = lib.knat_revcomp(seq.encode(), n, out)
    if rc != 0:
        raise ValueError(f"illegal character in revcomp of {seq!r}")
    return out.raw.decode()


def finish_merge_native(seq1: str, quals1: str, rc2: str, rq2: str,
                        best_i: int, start_i: int, qual_offset: int):
    """Native merge finishing; returns (seq, quals) or None."""
    lib = get_lib()
    if lib is None:
        return None
    cap = len(seq1) + len(rc2)
    out_s = ctypes.create_string_buffer(cap)
    out_q = ctypes.create_string_buffer(cap)
    n = lib.knat_finish_merge(
        seq1.encode(), quals1.encode(), len(seq1),
        rc2.encode(), rq2.encode(), len(rc2),
        best_i, start_i, qual_offset, out_s, out_q,
    )
    return out_s.raw[:n].decode(), out_q.raw[:n].decode()


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_reads_native(seqs: list, quals: list, qual_offset: int, max_len: int, pad_to: int):
    """Native batch encode; returns (codes, badq, lengths) or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(seqs)
    seq_bytes = np.frombuffer("".join(seqs).encode(), np.uint8)
    qual_bytes = np.frombuffer("".join(quals).encode(), np.uint8)
    if len(seq_bytes) != len(qual_bytes):
        return None
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    rows = pad_to if pad_to is not None else n
    codes = host_full((rows, max_len), 4, np.uint8)
    badq = np.zeros((rows, max_len), np.uint8)
    lengths = np.zeros(rows, np.int32)
    bad = lib.knat_encode_reads(
        _u8ptr(seq_bytes), _u8ptr(qual_bytes),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, max_len, qual_offset + 20,
        _u8ptr(codes), _u8ptr(badq),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if bad >= 0:
        raise ValueError(f"illegal base character in read {bad}")
    return codes, badq.astype(bool), lengths


def merge_scan_native(seq1: str, quals1: str, rc2: str, rq2: str, qual_offset: int):
    """Native N-free overlap scan; returns best_i / -1 / -2, or None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    qa = np.frombuffer(quals1.encode(), np.uint8) - np.uint8(qual_offset)
    qb = np.frombuffer(rq2.encode(), np.uint8) - np.uint8(qual_offset)
    # below-offset wraps above 200; both out-of-table cases raise like the
    # reference DIE (merge_reads.cpp:536-540)
    if (qa >= 81).any() or (qb >= 81).any():
        raise ValueError("Invalid quality score (phred offset mismatch?)")
    return lib.knat_merge_scan(
        seq1.encode(), _u8ptr(np.ascontiguousarray(qa)), len(seq1),
        rc2.encode(), _u8ptr(np.ascontiguousarray(qb)), len(rc2), qual_offset,
    )
