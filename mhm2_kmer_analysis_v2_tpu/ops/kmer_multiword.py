"""Multi-word k-mer ops for k > 32 (MAX_K 64/96/128/160).

The reference instantiates Kmer<MAX_K> templates with N_LONGS=(MAX_K+31)/32
uint64 words (src/kmer.hpp:64-65, CMakeLists.txt:259-271).  Here a k-mer is
W = ceil(k/16) uint32 words:

  word 0   = the first r = k - 16*(W-1) bases, right-aligned
  word j>0 = bases [r + 16*(j-1), r + 16*j), full 16-base words

Wordwise lexicographic order equals base-string order under A<C<G<T (word 0
holds the most significant bases), so canonicalization picks the same strand
as the reference's big-endian compare (src/kmer.cpp:270-277).  For W=2 this
layout coincides with ops.kmer_ops's (hi, lo) pair.

Every word is derived from the same width-16 fwd/rc window pyramids used by
the k<=32 path — no extra pyramid work, just shifted views — and the
minimizer (m <= 27) is computed exactly as there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kmer_ops import (
    CODE_N,
    EXT_INVALID,
    U32,
    _compose32,
    _pair_min,
    _pyramids32,
    _sliding_max32,
    _sliding_max_pair,
    minimizer_len_for_k,
    route_hash,
)


def n_words(k: int) -> int:
    return -(-k // 16)


def _words_lt(a: list, b: list):
    """Lexicographic a < b over word lists."""
    lt = None
    eq = None
    for aw, bw in zip(a, b):
        wlt = aw < bw
        weq = aw == bw
        if lt is None:
            lt, eq = wlt, weq
        else:
            lt = lt | (eq & wlt)
            eq = eq & weq
    return lt


def _rev32(w):
    """Complement + reverse the 16 base groups of a u32 word."""
    v = ~w.astype(U32)
    v = (
        ((v >> U32(24)) & U32(0xFF))
        | ((v >> U32(8)) & U32(0xFF00))
        | ((v << U32(8)) & U32(0xFF0000))
        | (v << U32(24))
    )
    m4 = U32(0x0F0F0F0F)
    v = ((v >> U32(4)) & m4) | ((v & m4) << U32(4))
    m2 = U32(0x33333333)
    v = ((v >> U32(2)) & m2) | ((v & m2) << U32(2))
    return v


def _ext_bits(wl: list, s: int, nbits: int):
    """Extract nbits (<= 64) at LSB-offset s from a little-endian u32 word
    list, as a (hi, lo) pair; s/nbits static."""
    j0, r0 = divmod(s, 32)

    def word(i):
        return wl[i] if 0 <= i < len(wl) else jnp.zeros_like(wl[0])

    if r0 == 0:
        lo = word(j0)
        hi = word(j0 + 1)
    else:
        lo = (word(j0) >> U32(r0)) | (word(j0 + 1) << U32(32 - r0))
        hi = (word(j0 + 1) >> U32(r0)) | (word(j0 + 2) << U32(32 - r0))
    if nbits <= 32:
        lo = lo & U32((1 << nbits) - 1) if nbits < 32 else lo
        hi = jnp.zeros_like(hi)
    elif nbits < 64:
        hi = hi & U32((1 << (nbits - 32)) - 1)
    return hi, lo


def route_kmer_words(planes: list, k: int, n_shards: int, m: int | None = None):
    """Owner shard of standalone canonical multi-word k-mers.

    planes: W [Q] u32 word planes (word 0 = leading r bases right-aligned).
    Bit-identical minimizer SELECTION to kmer_records_mw — per-window
    min(fwd m-mer, rc m-mer), max over the k-m+1 windows, route_hash — so
    queries/traversal look k-mers up where the count step placed them
    (reference routing: src/kcount/kmer_dht.cpp:193-196)."""
    from .kmer_ops import _pair_lt

    if m is None:
        m = minimizer_len_for_k(k)
    Wn = len(planes)
    assert Wn == n_words(k)
    # little-endian padded word lists; rc list is bit-shifted by D = 32-2r
    wl = list(reversed(planes))
    rc_wl = [_rev32(p) for p in planes]
    r = k - 16 * (Wn - 1)
    D = 32 - 2 * r if r < 16 else 0
    bh = bl = None
    for i in range(k - m + 1):
        fh, fl = _ext_bits(wl, 2 * (k - m - i), 2 * m)
        gh, gl = _ext_bits(rc_wl, 2 * i + D, 2 * m)
        lh, ll = _pair_min(fh, fl, gh, gl)
        if bh is None:
            bh, bl = lh, ll
        else:
            take = _pair_lt(bh, bl, lh, ll)
            bh = jnp.where(take, lh, bh)
            bl = jnp.where(take, ll, bl)
    return (route_hash(bh, bl) % U32(n_shards)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "m", "n_shards"))
def kmer_records_mw(
    codes: jax.Array,
    badq: jax.Array,
    lengths: jax.Array,
    *,
    k: int,
    m: int | None = None,
    n_shards: int = 1,
):
    """Per-position canonical k-mer records for k in 17..160.

    Same contract as kmer_ops.kmer_records but ``canon`` is a [W, B, L]
    uint32 stack.
    """
    assert 16 < k <= 160
    if m is None:
        m = minimizer_len_for_k(k)
    assert m <= min(k, 27)
    B, L = codes.shape
    assert L >= k, "read window shorter than k"
    codes = codes.astype(jnp.int32)
    codes_g = jnp.where(codes >= CODE_N, 2, codes)

    fwd_pyr, rc_pyr = _pyramids32(codes_g, 16)
    W16 = fwd_pyr[16]
    RCW = rc_pyr[16]

    def fwd_w(w):
        return W16 if w == 16 else (W16 >> U32(2 * (16 - w)))

    def rc_w(w):
        return RCW if w == 16 else (RCW & U32((1 << (2 * w)) - 1))

    Wn = n_words(k)
    r = k - 16 * (Wn - 1)

    fwd_words = [fwd_w(r)]
    for j in range(1, Wn):
        fwd_words.append(jnp.roll(W16, -(r + 16 * (j - 1)), axis=1))
    # rc word j covers rc-seq bases [16j-?, ...): rc word 0 = rc of the LAST r
    # input bases (window at i+k-r); rc word j>0 = rc of input bases
    # [i+k-r-16j, i+k-r-16j+16)
    rc_words = [jnp.roll(rc_w(r), -(k - r), axis=1)]
    for j in range(1, Wn):
        rc_words.append(jnp.roll(RCW, -(k - r - 16 * j), axis=1))

    flip = _words_lt(rc_words, fwd_words)
    canon = jnp.stack(
        [jnp.where(flip, rw, fw) for fw, rw in zip(fwd_words, rc_words)], axis=0
    )

    if n_shards == 1:
        target = jnp.zeros((B, L), jnp.int32)
    elif m <= 16:
        least = jnp.minimum(fwd_w(m), rc_w(m))
        best = _sliding_max32(least, k - m + 1)
        target = (route_hash(jnp.zeros_like(best), best) % U32(n_shards)).astype(jnp.int32)
    else:
        hwm = m - 16
        fmh = fwd_w(hwm)
        fml = jnp.roll(W16, -hwm, axis=1)
        rmh = jnp.roll(rc_w(hwm), -16, axis=1)
        rml = RCW
        lh, ll = _pair_min(fmh, fml, rmh, rml)
        bh, bl = _sliding_max_pair(lh, ll, k - m + 1)
        target = (route_hash(bh, bl) % U32(n_shards)).astype(jnp.int32)

    ext_of = jnp.where(badq | (codes >= CODE_N), EXT_INVALID, codes)
    left = jnp.roll(ext_of, 1, axis=1)
    right = jnp.roll(ext_of, -k, axis=1)
    comp_left = jnp.where(right < 4, 3 - right, right)
    comp_right = jnp.where(left < 4, 3 - left, left)
    left = jnp.where(flip, comp_left, left)
    right = jnp.where(flip, comp_right, right)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    lens = lengths.astype(jnp.int32)[:, None]
    valid = (pos >= 1) & (pos <= lens - k - 1) & (lens >= k + 2)

    return {
        "canon": canon,  # [W, B, L]
        "left": left.astype(jnp.int32),
        "right": right.astype(jnp.int32),
        "target": target,
        "valid": valid,
    }


def words_to_strings(words, k: int):
    """Decode [W, N] uint32 word stacks to base strings (host, vectorized)."""
    import numpy as np

    Wn = n_words(k)
    r = k - 16 * (Wn - 1)
    bases = np.array(list("ACGT"))
    cols = []
    for j, width in enumerate([r] + [16] * (Wn - 1)):
        w = np.asarray(words[j], dtype=np.uint32)
        shifts = (2 * (width - 1 - np.arange(width))).astype(np.uint32)
        codes = (w[:, None] >> shifts[None, :]) & np.uint32(3)
        cols.append(codes)
    codes = np.concatenate(cols, axis=1)
    return ["".join(row) for row in bases[codes.astype(np.int64)]]
