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
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(_SO + ".tmp", _SO)
        except Exception:
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
    _lib = lib
    return _lib


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
    codes = np.full((rows, max_len), 4, np.uint8)
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
