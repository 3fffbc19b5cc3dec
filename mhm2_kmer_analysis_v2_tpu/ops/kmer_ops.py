"""Vectorized k-mer core ops (JAX).

TPU-first re-design of the reference's scalar k-mer machinery
(src/kmer.cpp, src/kcount/kcount-gpu/parse_and_pack.cpp): instead of a
per-thread loop over k-mers, whole read batches ``[B, L]`` are processed with
O(log k) elementwise passes using log-doubling "window pyramids".

Value model (k <= 32 for now; multi-word k in ops/kmer_multiword.py):
  A k-mer is a uint64 with base i at bits ``2*(k-1-i)`` (first base most
  significant).  Integer order over these values equals lexicographic base
  order under A<C<G<T, which is exactly the order the reference uses for
  canonicalization (src/kmer.cpp:270-277 compares big-endian-packed longs), so
  ``canonical = min(v, revcomp(v))`` matches the reference bit-for-bit in
  *which* strand is chosen.

Minimizer parity: `minimizers()` reproduces Kmer::get_minimizer_fast
(src/kmer.cpp:349-398) exactly — per window min(fwd m-mer, rc m-mer), max over
windows, value left-aligned in the uint64 — and `quick_hash` is bit-exact with
src/hash_funcs.c:332-342, so shard routing has the same skew-resistance and
balance properties as the reference's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U64 = jnp.uint64
MASK64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)

# base codes: A=0 C=1 G=2 T=3, N=4 (invalid-as-kmer-base -> G, invalid-as-ext)
CODE_N = 4
# extension codes: 0-3 = ACGT, >=4 = no-contribution ('0'/'N',
# src/kcount/kcount_cpu.cpp:157-163 inc() ignores non-ACGT)
EXT_INVALID = 4


def quick_hash(v: jax.Array) -> jax.Array:
    """Bit-exact xorshift-multiply hash of src/hash_funcs.c:332-342."""
    v = v.astype(U64)
    v = v * U64(3935559000370003845) + U64(2691343689449507681)
    v = v ^ (v >> U64(21))
    v = v ^ (v << U64(37))
    v = v ^ (v >> U64(4))
    v = v * U64(4768777513237032717)
    v = v ^ (v << U64(20))
    v = v ^ (v >> U64(41))
    v = v ^ (v << U64(5))
    return v


def fmix64(v: jax.Array) -> jax.Array:
    """Murmur3 finalizer (src/hash_funcs.c:65-73); used for table slot hashing.

    The reference hashes full k-mer bytes with MurmurHash3_x64_64 for slot
    choice (src/kcount/kcount_cpu.cpp:233); slot placement is unobservable in
    the output so we use the cheaper finalizer, which has equivalent avalanche
    quality for 64-bit keys.
    """
    v = v.astype(U64)
    v = v ^ (v >> U64(33))
    v = v * U64(0xFF51AFD7ED558CCD)
    v = v ^ (v >> U64(33))
    v = v * U64(0xC4CEB9FE1A85EC53)
    v = v ^ (v >> U64(33))
    return v


def minimizer_len_for_k(k: int) -> int:
    """clamp(2k/3+1, 15, 27) per src/kcount/kmer_dht.cpp:117-119."""
    return max(15, min(27, k * 2 // 3 + 1))


def _decompose(k: int) -> list[int]:
    """k as descending powers of two."""
    out, p = [], 1 << (k.bit_length() - 1)
    while k:
        if k >= p:
            out.append(p)
            k -= p
        p >>= 1
    return out


@functools.partial(jax.jit, static_argnames=("width",))
def _pyramids(codes: jax.Array, width: int):
    """Build fwd and rc window-value pyramids up to the given width.

    codes: [B, L] int32 base codes with N already mapped to G.
    Returns ({w: fwd_w}, {w: rc_w}) where fwd_w[:, i] is the 2-bit packed
    value of window codes[i:i+w] and rc_w[:, i] is the packed value of the
    reverse complement of that window.  Positions with i+w > L hold garbage
    (wrapped by roll); callers mask them.
    """
    c = codes.astype(U64)
    fwd = {1: c}
    rc = {1: U64(3) - c}
    w = 1
    while w < width:
        a, b = fwd[w], jnp.roll(fwd[w], -w, axis=1)
        fwd[2 * w] = (a << U64(2 * w)) | b
        ra, rb = rc[w], jnp.roll(rc[w], -w, axis=1)
        # rc(concat(A, B)) = concat(rc(B), rc(A))
        rc[2 * w] = (rb << U64(2 * w)) | ra
        w *= 2
    return fwd, rc


def _compose(pyr: dict, k: int, reverse: bool) -> jax.Array:
    """Window values of width k from a pyramid of power-of-two widths.

    For fwd windows: value = concat of sub-window values, first part most
    significant.  For rc windows the parts are concatenated in reverse order.
    """
    parts = _decompose(k)
    off = 0
    chunks = []  # (offset, width, values-at-window-start)
    for p in parts:
        vals = jnp.roll(pyr[p], -off, axis=1) if off else pyr[p]
        chunks.append((off, p, vals))
        off += p
    if reverse:
        # rc(W1 ++ W2 ++ ...) = rc(Wn) ++ ... ++ rc(W1):
        # part j contributes at bit offset 2*off_j from the LSB side.
        out = None
        for off_j, _, vals in chunks:
            term = vals << U64(2 * off_j)
            out = term if out is None else out | term
        return out
    out = None
    rem = k
    for off_j, p, vals in chunks:
        rem -= p
        term = vals << U64(2 * rem)
        out = term if out is None else out | term
    return out


def _sliding_max(x: jax.Array, w: int) -> jax.Array:
    """out[:, i] = max(x[:, i:i+w]) via log-doubling (garbage past L-w)."""
    span = 1
    while span < w:
        step = min(span, w - span)
        x = jnp.maximum(x, jnp.roll(x, -step, axis=1))
        span += step
    return x


@functools.partial(jax.jit, static_argnames=("k", "m", "n_shards"))
def kmer_records(
    codes: jax.Array,
    badq: jax.Array,
    lengths: jax.Array,
    *,
    k: int,
    m: int | None = None,
    n_shards: int = 1,
):
    """Compute per-position canonical k-mer records for a read batch.

    Args:
      codes: [B, L] int32/uint8 base codes (0-3 ACGT, 4 N).
      badq: [B, L] bool, True where base quality < qual_offset+20
        (the reference's lowercase marking, src/kcount/kcount.cpp:80-85).
      lengths: [B] int32 read lengths.
      k: k-mer length (<= 32 here).
      m: minimizer length (default: reference formula).
      n_shards: number of owner shards for routing.

    Returns dict of [B, L] arrays:
      canon:  uint64 canonical k-mer value at start position i
      left:   int32 left-extension code (0-3, or >=4 for none)
      right:  int32 right-extension code
      target: int32 owner shard id
      valid:  bool — position is counted (1 <= i <= len-k-1, len >= k+2;
              the reference never counts a read's first or last k-mer,
              src/kcount/kcount_cpu.cpp:84-103)
    """
    assert k <= 32, "use multiword path for k > 32"
    if m is None:
        m = minimizer_len_for_k(k)
    assert m <= k
    B, L = codes.shape
    codes = codes.astype(jnp.int32)
    # Ns inside a k-mer become G - the (c&4)>>1 trick maps 'N' to G
    # (src/kmer.cpp:173 "Note this converts Ns to Gs"; check_n is false on the
    # CPU counting path).
    codes_g = jnp.where(codes >= CODE_N, 2, codes)

    fwd_pyr, rc_pyr = _pyramids(codes_g, 1 << (k.bit_length() - 1))
    fwd_k = _compose(fwd_pyr, k, reverse=False)
    rc_k = _compose(rc_pyr, k, reverse=True)
    flip = rc_k < fwd_k
    canon = jnp.where(flip, rc_k, fwd_k)

    # minimizer: least-complement m-mer per window, greatest over the k-m+1
    # windows of the k-mer, left-aligned (src/kmer.cpp:349-398).
    fwd_m = _compose(fwd_pyr, m, reverse=False)
    rc_m = _compose(rc_pyr, m, reverse=True)
    # windows beyond each read's end contain wrapped garbage; they are only
    # ever consumed by valid k-mer start positions, for which all k-m+1
    # windows are in range, so no extra masking is needed here.
    least = jnp.minimum(fwd_m, rc_m)
    minimizer = _sliding_max(least, k - m + 1) << U64(2 * (32 - m))
    target = (quick_hash(minimizer) % U64(n_shards)).astype(jnp.int32)

    # extensions: flanking bases; low-quality or N flanks contribute nothing
    # ('0' ext, src/kcount/kcount_cpu.cpp:322-325).
    ext_of = jnp.where(badq | (codes >= CODE_N), EXT_INVALID, codes)
    left = jnp.roll(ext_of, 1, axis=1)  # base at i-1
    right = jnp.roll(ext_of, -k, axis=1)  # base at i+k
    # canonical flip swaps and complements extensions
    # (src/kcount/kcount_cpu.cpp:327-333); invalid stays invalid
    # (comp_nucleotide('0')='0', src/utils.cpp:131-159).
    comp_left = jnp.where(right < 4, 3 - right, right)
    comp_right = jnp.where(left < 4, 3 - left, left)
    left = jnp.where(flip, comp_left, left)
    right = jnp.where(flip, comp_right, right)

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    lens = lengths.astype(jnp.int32)[:, None]
    valid = (pos >= 1) & (pos <= lens - k - 1) & (lens >= k + 2)

    return {
        "canon": canon,
        "left": left.astype(jnp.int32),
        "right": right.astype(jnp.int32),
        "target": target,
        "valid": valid,
    }


@functools.partial(jax.jit, static_argnames=("k",))
def revcomp_vals(vals: jax.Array, k: int) -> jax.Array:
    """Reverse complement of packed k-mer values (for queries/traversal)."""
    v = vals.astype(U64)
    out = jnp.zeros_like(v)
    for _ in range(k):
        out = (out << U64(2)) | (U64(3) - (v & U64(3)))
        v = v >> U64(2)
    return out
