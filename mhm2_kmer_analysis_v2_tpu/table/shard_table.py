"""Shard-local k-mer hash table, HBM-resident, batch-vectorized.

TPU-native answer to the reference's two hash-table designs:
  - CPU: linear-probe open addressing with per-kmer scalar inserts
    (src/kcount/kcount_cpu.cpp:205-295)
  - GPU: CAS/quadratic-probe per-thread inserts
    (src/kcount/kcount-gpu/gpu_hash_table.cpp:357-424)

Neither maps to a vector machine; instead each received batch is
sort-deduplicated (segmented reduction over equal keys) and then committed
with *optimistic vectorized probe sweeps*: every still-active lane gathers its
slot's key, empty slots are claimed with a scatter, the scatter is verified by
re-gather (duplicate-index scatter picks one winner; losers simply advance to
the next slot), and winners/matches do a scatter-add of their pre-aggregated
counts.  No atomics or per-element CAS — duplicate keys are eliminated before
probing, so scatter-adds hit unique slots.

Layout (SoA, per shard):
  keys:   [capacity] uint64, EMPTY = all-ones (the reference's 0xFF.. sentinel,
          src/kcount/kcount_cpu.cpp:217)
  counts: [capacity] int32 (saturated to uint16 max at finalize; per-add
          saturation with positive increments == final min, matching
          inc_with_limit at src/kcount/kcount_cpu.cpp:152-155)
  extc:   [capacity, 8] int32 — left A,C,G,T then right A,C,G,T

Capacity uses a nearest-prime like the reference's prime tables
(src/kcount/prime.hpp) with target load factor 0.66
(src/kcount/kcount_cpu.cpp:442); probe cap matches KCOUNT_HT_MAX_PROBE=100
(CMakeDefinitions.txt:67).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer_ops import fmix64

U64 = jnp.uint64
EMPTY = jnp.uint64(0xFFFFFFFFFFFFFFFF)
MAX_PROBE = 100  # KCOUNT_HT_MAX_PROBE, CMakeDefinitions.txt:67
UINT16_MAX = 65535
TARGET_LOAD_FACTOR = 0.66  # src/kcount/kcount_cpu.cpp:442


def next_prime(n: int) -> int:
    """Smallest prime >= n (replaces the reference's precomputed prime tables,
    src/kcount/prime.hpp:854-893 — host-side sympy-free Miller-Rabin)."""
    if n <= 2:
        return 2
    n |= 1
    while not _is_prime(n):
        n += 2
    return n


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


class ShardTable(NamedTuple):
    """Functional table state (a pytree; thread through jitted steps)."""

    keys: jax.Array  # [cap] uint64
    counts: jax.Array  # [cap] int32
    extc: jax.Array  # [cap, 8] int32
    num_elems: jax.Array  # [] int32
    num_dropped: jax.Array  # [] int32
    sum_probe: jax.Array  # [] int64
    max_probe: jax.Array  # [] int32

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


def create(max_elems: int, load_factor: float = TARGET_LOAD_FACTOR) -> ShardTable:
    cap = next_prime(max(int(max_elems / load_factor), 11))
    return ShardTable(
        keys=jnp.full((cap,), EMPTY, dtype=U64),
        counts=jnp.zeros((cap,), dtype=jnp.int32),
        extc=jnp.zeros((cap, 8), dtype=jnp.int32),
        num_elems=jnp.zeros((), jnp.int32),
        num_dropped=jnp.zeros((), jnp.int32),
        sum_probe=jnp.zeros((), jnp.int64),
        max_probe=jnp.zeros((), jnp.int32),
    )


def _dedup(canon, left, right, cnt, valid):
    """Sort by key and aggregate duplicates onto each run's first lane.

    Returns (keys, acc_counts [R], acc_extc [R, 8], active mask) where active
    lanes carry the aggregated totals for one unique key each.  This is the
    idiomatic TPU replacement for the reference GPU kernel's per-thread atomic
    ext adds (gpu_hash_table.cpp:398-423).
    """
    R = canon.shape[0]
    skey = jnp.where(valid, canon, EMPTY)
    order = jnp.argsort(skey)
    skey = skey[order]
    sleft = left[order]
    sright = right[order]
    scnt = jnp.where(valid, cnt, 0)[order]
    svalid = valid[order]

    first = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    ) & svalid
    # group-start position for every lane (running max of first-positions)
    idx = jnp.arange(R, dtype=jnp.int32)
    gsp = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
    gsp = jnp.where(svalid, gsp, R)  # invalid lanes scatter out of bounds

    acc_cnt = jnp.zeros((R,), jnp.int32).at[gsp].add(scnt, mode="drop")
    onehot_l = (sleft[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    onehot_r = (sright[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    contrib = jnp.concatenate([onehot_l, onehot_r], axis=1) * scnt[:, None]
    acc_ext = jnp.zeros((R, 8), jnp.int32).at[gsp].add(contrib, mode="drop")
    return skey, acc_cnt, acc_ext, first


@jax.jit
def insert_batch(table: ShardTable, canon, left, right, cnt, valid) -> ShardTable:
    """Insert one batch of canonical k-mer records into the table."""
    cap = table.capacity
    skey, acc_cnt, acc_ext, active = _dedup(canon, left, right, cnt, valid)
    R = skey.shape[0]

    slot0 = (fmix64(skey) % U64(cap)).astype(jnp.int32)

    def cond(state):
        _, _, _, active, _, it, *_ = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        keys, counts, extc, active, slot, it, n_new, sum_p, max_p = state
        gslot = jnp.where(active, slot, 0)
        tk = keys[gslot]
        is_match = active & (tk == skey)
        is_empty = active & (tk == EMPTY)
        # optimistic claim of empty slots; duplicate-index scatter keeps one
        # winner (which one is unspecified — harmless: losers advance and the
        # final key->counts contents are order-independent)
        claim_slot = jnp.where(is_empty, slot, cap)
        keys = keys.at[claim_slot].set(skey, mode="drop")
        won = is_empty & (keys[gslot] == skey)
        commit = is_match | won
        add_slot = jnp.where(commit, slot, cap)
        counts = counts.at[add_slot].add(acc_cnt, mode="drop")
        extc = extc.at[add_slot].add(acc_ext, mode="drop")
        probes = it + 1
        sum_p = sum_p + jnp.sum(jnp.where(commit, probes, 0)).astype(jnp.int64)
        max_p = jnp.maximum(max_p, jnp.where(jnp.any(commit), probes, 0))
        n_new = n_new + jnp.sum(won).astype(jnp.int32)
        active = active & ~commit
        slot = jnp.where(active, (slot + 1) % cap, slot)
        return keys, counts, extc, active, slot, it + 1, n_new, sum_p, max_p

    # scalar counters start as *varying* zeros (derived from batch data) so
    # the while_loop carry types agree under shard_map's manual-axes tracking
    zero_v = (slot0[0] & 0).astype(jnp.int32)
    init = (
        table.keys,
        table.counts,
        table.extc,
        active,
        slot0,
        zero_v,
        zero_v,
        table.sum_probe,
        table.max_probe,
    )
    keys, counts, extc, active, _, _, n_new, sum_p, max_p = jax.lax.while_loop(
        cond, body, init
    )
    dropped = jnp.sum(active).astype(jnp.int32)  # probe cap exceeded
    return ShardTable(
        keys=keys,
        counts=counts,
        extc=extc,
        num_elems=table.num_elems + n_new,
        num_dropped=table.num_dropped + dropped,
        sum_probe=sum_p,
        max_probe=max_p,
    )


def _dmin_lut(dmin_thres: int) -> np.ndarray:
    """LUT count -> dmin_dyn, exactly (int)((1.0-DYN_MIN_DEPTH)*count) in C
    double arithmetic (src/kcount/kcount_cpu.cpp:178; DYN_MIN_DEPTH=0.9).

    Computed host-side in float64 so device finalize needs no f64 math.
    """
    counts = np.arange(UINT16_MAX + 1, dtype=np.float64)
    dmin = np.trunc((1.0 - 0.9) * counts).astype(np.int32)
    return np.maximum(dmin, dmin_thres)


class FinalizedShard(NamedTuple):
    """Compact per-shard output: only UU k-mers (count>=2, both exts called)."""

    keys: jax.Array  # [cap] uint64 (EMPTY where purged)
    counts: jax.Array  # [cap] int32 (uint16-saturated)
    left_ext: jax.Array  # [cap] int32 code 0-3=ACGT, 4='X', 5='F'
    right_ext: jax.Array
    keep: jax.Array  # [cap] bool
    num_kept: jax.Array  # [] int64
    sum_counts: jax.Array  # [] int64 ("Total kmer count sum")
    num_purged: jax.Array  # [] int64


EXT_X = 4
EXT_F = 5


def _call_ext(extc4: jax.Array, dmin: jax.Array) -> jax.Array:
    """Vectorized ExtCounts::get_ext (src/kcount/kcount_cpu.cpp:173-182).

    extc4: [cap, 4] saturated counts; dmin: [cap] dynamic min depth.
    Sort order: count desc, ties by higher base char (T>G>C>A) — encoded as
    score = count*4 + base_code so argmax reproduces the tie-break.
    """
    base_code = jnp.arange(4, dtype=jnp.int32)[None, :]
    score = extc4 * 4 + base_code
    top_score = jnp.max(score, axis=1)
    top_base = (top_score % 4).astype(jnp.int32)
    top_cnt = top_score // 4
    masked = jnp.where(score == top_score[:, None], -1, score)
    runner_cnt = jnp.maximum(jnp.max(masked, axis=1), -1) // 4
    ext = jnp.where(
        top_cnt < dmin,
        EXT_X,
        jnp.where(runner_cnt >= dmin, EXT_F, top_base),
    )
    return ext.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def _finalize_jit(table: ShardTable, dmin_lut: jax.Array) -> FinalizedShard:
    occupied = table.keys != EMPTY
    counts = jnp.minimum(table.counts, UINT16_MAX)
    extc = jnp.minimum(table.extc, UINT16_MAX)
    dmin = dmin_lut[jnp.clip(counts, 0, UINT16_MAX)]
    left = _call_ext(extc[:, :4], dmin)
    right = _call_ext(extc[:, 4:], dmin)
    # purge count<2 and X/F extensions (src/kcount/kcount_cpu.cpp:554-573)
    keep = occupied & (counts >= 2) & (left < 4) & (right < 4)
    num_kept = jnp.sum(keep).astype(jnp.int64)
    sum_counts = jnp.sum(jnp.where(keep, counts, 0)).astype(jnp.int64)
    num_purged = jnp.sum(occupied).astype(jnp.int64) - num_kept
    return FinalizedShard(
        keys=jnp.where(keep, table.keys, EMPTY),
        counts=counts,
        left_ext=left,
        right_ext=right,
        keep=keep,
        num_kept=num_kept,
        sum_counts=sum_counts,
        num_purged=num_purged,
    )


def finalize(table: ShardTable, dmin_thres: int = 2) -> FinalizedShard:
    """Call extensions, purge, and produce the compact shard table.

    Equivalent of HashTableInserter::insert_into_local_hashtable
    (src/kcount/kcount_cpu.cpp:523-601) + the GPU purge/compact kernels
    (gpu_hash_table.cpp:205-268)."""
    lut = jnp.asarray(_dmin_lut(dmin_thres))
    return _finalize_jit(table, lut)


_EXT_CHARS = np.array(list("ACGTXF"))
_BASES = np.array(list("ACGT"))


def compact_to_host(fin: FinalizedShard):
    """Pull kept entries to host as (vals u64, counts, left chars, right chars),
    sorted by k-mer value."""
    keep = np.asarray(fin.keep)
    vals = np.asarray(fin.keys)[keep]
    counts = np.asarray(fin.counts)[keep]
    left = _EXT_CHARS[np.asarray(fin.left_ext)[keep]]
    right = _EXT_CHARS[np.asarray(fin.right_ext)[keep]]
    order = np.argsort(vals)
    return vals[order], counts[order], left[order], right[order]


def vals_to_strings(vals: np.ndarray, k: int) -> list:
    """Decode packed uint64 k-mer values to base strings (vectorized)."""
    shifts = (2 * (k - 1 - np.arange(k))).astype(np.uint64)
    codes = (vals[:, None] >> shifts[None, :]) & np.uint64(3)
    chars = _BASES[codes.astype(np.int64)]
    return ["".join(row) for row in chars]
