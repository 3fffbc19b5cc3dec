"""Vectorized k-mer core ops (JAX), uint32-pair representation.

TPU-first re-design of the reference's scalar k-mer machinery
(src/kmer.cpp, src/kcount/kcount-gpu/parse_and_pack.cpp): whole read batches
``[B, L]`` are processed with O(log k) elementwise passes using log-doubling
"window pyramids".  TPUs have no native 64-bit integer datapath (XLA emulates
it at ~2x cost per op), so the device hot path works entirely in uint32 pairs
— the SURVEY §7 "64-bit hash math on TPU" plan.

Value model (k <= 32 here; multi-word k in kmer_multiword.py):
  A k-mer is the conceptual 2k-bit integer with base i at bits ``2*(k-1-i)``
  (first base most significant), carried as (hi, lo) uint32 with
  hi = value >> 32, lo = value & 0xFFFFFFFF.  Lexicographic pair order equals
  lexicographic base order under A<C<G<T, which is the order the reference
  uses for canonicalization (src/kmer.cpp:270-277 compares big-endian-packed
  longs), so ``canonical = min(v, revcomp(v))`` picks the same strand
  bit-for-bit.

Minimizer parity: the minimizer *selection* reproduces
Kmer::get_minimizer_fast (src/kmer.cpp:349-398) exactly — per window
min(fwd m-mer, rc m-mer), max over the k-m+1 windows.  Only the final
avalanche hash used for shard routing differs from the reference's 64-bit
quick_hash (src/hash_funcs.c:332-342): we use a 32-bit murmur-finalizer
composition (`route_hash`), which has the same uniformity; shard placement is
unobservable in the output (parity is over merged counts, not placement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32
U64 = jnp.uint64

# base codes: A=0 C=1 G=2 T=3, N=4 (N -> G as a k-mer base, invalid as ext)
CODE_N = 4
# extension codes: 0-3 = ACGT, >=4 = no-contribution ('0'/'N',
# src/kcount/kcount_cpu.cpp:157-163 inc() ignores non-ACGT)
EXT_INVALID = 4


def quick_hash(v: jax.Array) -> jax.Array:
    """Bit-exact 64-bit xorshift-multiply hash of src/hash_funcs.c:332-342.

    Host/finalize-side only (u64); the device hot path routes with
    `route_hash` below.
    """
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


def fmix32(v: jax.Array) -> jax.Array:
    """Murmur3 32-bit finalizer — full-avalanche mix for u32."""
    v = v.astype(U32)
    v = v ^ (v >> U32(16))
    v = v * U32(0x85EBCA6B)
    v = v ^ (v >> U32(13))
    v = v * U32(0xC2B2AE35)
    v = v ^ (v >> U32(16))
    return v


def route_hash(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Shard-routing hash of a (hi, lo) minimizer pair.

    Replaces the reference's quick_hash(minimizer) (kmer_dht.cpp:193-196) with
    a u32 composition: fmix32(fmix32(hi) ^ lo).  The minimizer *selection*
    stays reference-exact; only this final avalanche differs (placement is
    unobservable, distribution quality equivalent).
    """
    return fmix32(fmix32(hi) ^ lo.astype(U32))


def slot_hash(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Table-slot hash of a k-mer (hi, lo) pair; independent mix from
    route_hash so per-shard slot distribution is not correlated with the
    shard-selection residue (reference uses MurmurHash3_x64_64 of the kmer
    bytes, src/kcount/kcount_cpu.cpp:233 — equally unobservable)."""
    return fmix32(lo ^ (hi * U32(0x9E3779B9)) ^ U32(0x5BD1E995))


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


def _pyramids32(codes_g: jax.Array, width: int):
    """Build fwd and rc u32 window-value pyramids up to width <= 16.

    codes_g: [B, L] int32 base codes with N already mapped to G.
    Returns ({w: fwd_w}, {w: rc_w}) where fwd_w[:, i] is the 2-bit packed
    value of window codes[i:i+w] and rc_w[:, i] the packed value of its
    reverse complement.  Positions with i+w > L hold wrapped garbage; callers
    mask them.
    """
    assert width <= 16
    c = codes_g.astype(U32)
    fwd = {1: c}
    rc = {1: U32(3) - c}
    w = 1
    while w < width:
        a, b = fwd[w], jnp.roll(fwd[w], -w, axis=1)
        fwd[2 * w] = (a << U32(2 * w)) | b
        ra, rb = rc[w], jnp.roll(rc[w], -w, axis=1)
        # rc(concat(A, B)) = concat(rc(B), rc(A))
        rc[2 * w] = (rb << U32(2 * w)) | ra
        w *= 2
    return fwd, rc


def _compose32(pyr: dict, w: int, reverse: bool) -> jax.Array:
    """u32 window values of width w (<=16) from a power-of-two pyramid."""
    assert w <= 16
    parts = _decompose(w)
    off = 0
    chunks = []
    for p in parts:
        vals = jnp.roll(pyr[p], -off, axis=1) if off else pyr[p]
        chunks.append((off, p, vals))
        off += p
    out = None
    if reverse:
        # rc(W1 ++ W2 ++ ...) = rc(Wn) ++ ... ++ rc(W1)
        for off_j, _, vals in chunks:
            term = vals << U32(2 * off_j)
            out = term if out is None else out | term
        return out
    rem = w
    for off_j, p, vals in chunks:
        rem -= p
        term = vals << U32(2 * rem)
        out = term if out is None else out | term
    return out


def _pair_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _pair_min(ah, al, bh, bl):
    take_a = _pair_lt(ah, al, bh, bl)
    return jnp.where(take_a, ah, bh), jnp.where(take_a, al, bl)


def _pair_max(ah, al, bh, bl):
    take_a = _pair_lt(ah, al, bh, bl)
    return jnp.where(take_a, bh, ah), jnp.where(take_a, bl, al)


def _sliding_max32(x: jax.Array, w: int) -> jax.Array:
    """out[:, i] = max(x[:, i:i+w]) via log-doubling (garbage past L-w)."""
    span = 1
    while span < w:
        step = min(span, w - span)
        x = jnp.maximum(x, jnp.roll(x, -step, axis=1))
        span += step
    return x


def _sliding_max_pair(hi, lo, w: int):
    span = 1
    while span < w:
        step = min(span, w - span)
        hi, lo = _pair_max(hi, lo, jnp.roll(hi, -step, axis=1), jnp.roll(lo, -step, axis=1))
        span += step
    return hi, lo


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
      canon_hi/canon_lo: uint32 canonical k-mer pair at start position i
      left/right: int32 extension codes (0-3, or >=4 for none)
      target: int32 owner shard id
      valid: bool — position is counted (1 <= i <= len-k-1, len >= k+2;
             the reference never counts a read's first or last k-mer,
             src/kcount/kcount_cpu.cpp:84-103)
    """
    assert k <= 32, "use the multiword path for k > 32"
    if m is None:
        m = minimizer_len_for_k(k)
    assert m <= k
    B, L = codes.shape
    codes = codes.astype(jnp.int32)
    # Ns inside a k-mer become G — the (c&4)>>1 trick maps 'N' to G
    # (src/kmer.cpp:173 "Note this converts Ns to Gs"; check_n is false on the
    # CPU counting path).
    codes_g = jnp.where(codes >= CODE_N, 2, codes)

    width = 16 if k >= 16 else 1 << (k.bit_length() - 1)
    fwd_pyr, rc_pyr = _pyramids32(codes_g, width)
    W = _compose32(fwd_pyr, width, reverse=False) if width not in fwd_pyr else fwd_pyr[width]
    RCW = _compose32(rc_pyr, width, reverse=True) if width not in rc_pyr else rc_pyr[width]

    def fwd_w(w):
        """Width-w fwd window values at each start, derived from the width-16
        (or max pyramid) values by dropping trailing bases: Ww = W >> 2(16-w)."""
        if w == width:
            return W
        if w < width:
            return W >> U32(2 * (width - w))
        return _compose32(fwd_pyr, w, reverse=False)

    def rc_w(w):
        """Width-w rc window values: drop the rc's leading bases (the input
        window's trailing bases) by masking: RCw = RCW & ((1<<2w)-1)."""
        if w == width:
            return RCW
        if w < width:
            return RCW & U32((1 << (2 * w)) - 1)
        return _compose32(rc_pyr, w, reverse=True)

    if k <= 16:
        lo = fwd_w(k)
        hi = jnp.zeros_like(lo)
        rc_lo = rc_w(k)
        rc_hi = jnp.zeros_like(rc_lo)
    else:
        hw = k - 16
        hi = fwd_w(hw)
        lo = jnp.roll(W, -hw, axis=1)
        rc_hi = jnp.roll(rc_w(hw), -16, axis=1)
        rc_lo = RCW
    flip = _pair_lt(rc_hi, rc_lo, hi, lo)
    canon_hi = jnp.where(flip, rc_hi, hi)
    canon_lo = jnp.where(flip, rc_lo, lo)

    # minimizer: least-complement m-mer per window, greatest over the k-m+1
    # windows of the k-mer (selection identical to src/kmer.cpp:349-398).
    # With one shard every record routes to shard 0 — skip the minimizer
    # entirely (unobservable, like the GPU kernel's target array would be).
    if n_shards == 1:
        target = jnp.zeros(codes.shape, jnp.int32)
    elif m <= 16:
        least = jnp.minimum(fwd_w(m), rc_w(m))
        best = _sliding_max32(least, k - m + 1)
        target = (route_hash(jnp.zeros_like(best), best) % U32(n_shards)).astype(jnp.int32)
    else:
        hwm = m - 16
        fmh = fwd_w(hwm)
        fml = jnp.roll(W, -hwm, axis=1)
        rmh = jnp.roll(rc_w(hwm), -16, axis=1)
        rml = RCW
        lh, ll = _pair_min(fmh, fml, rmh, rml)
        bh, bl = _sliding_max_pair(lh, ll, k - m + 1)
        target = (route_hash(bh, bl) % U32(n_shards)).astype(jnp.int32)

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
        "canon_hi": canon_hi,
        "canon_lo": canon_lo,
        "left": left.astype(jnp.int32),
        "right": right.astype(jnp.int32),
        "target": target,
        "valid": valid,
    }


@functools.partial(jax.jit, static_argnames=("k",))
def revcomp_pairs(hi: jax.Array, lo: jax.Array, k: int):
    """Reverse complement of packed k-mer pairs (queries/traversal)."""
    hi = hi.astype(U32)
    lo = lo.astype(U32)
    out_hi = jnp.zeros_like(hi)
    out_lo = jnp.zeros_like(lo)
    for i in range(k):
        # extract base k-1-i (LSB side first) so appending reverses the order
        shift = 2 * i
        if shift >= 32:
            b = (hi >> U32(shift - 32)) & U32(3)
        else:
            b = (lo >> U32(shift)) & U32(3)
        c = U32(3) - b
        out_hi = (out_hi << U32(2)) | (out_lo >> U32(30))
        out_lo = (out_lo << U32(2)) | c
    mask_bits = 2 * k
    if mask_bits < 32:
        out_lo = out_lo & U32((1 << mask_bits) - 1)
        out_hi = jnp.zeros_like(out_hi)
    elif mask_bits < 64:
        out_hi = out_hi & U32((1 << (mask_bits - 32)) - 1)
    return out_hi, out_lo


def pairs_to_u64(hi, lo):
    """Combine pairs to uint64 (host/finalize side, x64 enabled)."""
    return (hi.astype(U64) << U64(32)) | lo.astype(U64)


def u64_to_pairs(v):
    v = v.astype(U64)
    return (v >> U64(32)).astype(U32), (v & U64(0xFFFFFFFF)).astype(U32)
