"""Multi-word shard table for k > 32 (keys are [W, cap] uint32 stacks).

Same vectorized claim-buffer probe insert as shard_table.py (see there for
the design rationale vs the reference's CPU linear probe and GPU CAS kernels)
with W-word key compares; the claim scatter also serializes the W word writes
per slot so multi-word keys can never interleave (the reference GPU kernel
needs its KEY_TRANSITION two-phase CAS for exactly this,
src/kcount/kcount-gpu/gpu_hash_table.cpp:368-424).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer_ops import fmix32
from . import shard_table as st

U32 = jnp.uint32
EMPTY = st.EMPTY
MAX_PROBE = st.MAX_PROBE


class MWShardTable(NamedTuple):
    keys: jax.Array  # [W, cap] uint32
    counts: jax.Array  # [cap] int32
    extc: jax.Array  # [cap*8] int32
    claim: jax.Array  # [cap] int32
    num_dropped: jax.Array  # [] int32

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]

    @property
    def n_words(self) -> int:
        return self.keys.shape[0]


def create(max_elems: int, n_words: int, load_factor: float = st.TARGET_LOAD_FACTOR) -> MWShardTable:
    cap = st.next_prime(max(int(max_elems / load_factor), 11))
    return MWShardTable(
        keys=jnp.full((n_words, cap), EMPTY, dtype=U32),
        counts=jnp.zeros((cap,), jnp.int32),
        extc=jnp.zeros((cap * 8,), jnp.int32),
        claim=jnp.full((cap,), -1, jnp.int32),
        num_dropped=jnp.zeros((), jnp.int32),
    )


def slot_hash_mw(words: jax.Array) -> jax.Array:
    """Fold fmix32 over the W words ([W, R] -> [R])."""
    h = jnp.zeros_like(words[0]) ^ U32(0x5BD1E995)
    for j in range(words.shape[0]):
        h = fmix32(h ^ words[j] ^ (U32(j) * U32(0x9E3779B9)))
    return h


def _probe_round_mw(tbl, recs):
    keys, counts, extc, claim = tbl
    words, left, right, cnt, lane, active, slot = recs
    Wn, cap = keys.shape
    gslot = jnp.where(active, slot, 0)
    tk = keys[:, gslot]  # [W, R]
    match_all = jnp.all(tk == words, axis=0)
    empty_all = jnp.all(tk == EMPTY, axis=0)
    is_empty = active & empty_all
    claim_slot = jnp.where(is_empty, slot, cap)
    claim = claim.at[claim_slot].set(lane, mode="drop")
    won = is_empty & (claim[gslot] == lane)
    w_slot = jnp.where(won, slot, cap)
    # unique winning slots: all W scatters stay consistent
    keys = keys.at[:, w_slot].set(words, mode="drop")
    claim = claim.at[claim_slot].set(-1, mode="drop")
    tk = keys[:, gslot]
    commit = active & jnp.all(tk == words, axis=0)
    add_slot = jnp.where(commit, slot, cap)
    counts = counts.at[add_slot].add(cnt, mode="drop")
    lidx = jnp.where(commit & (left < 4), add_slot * 8 + left, cap * 8)
    ridx = jnp.where(commit & (right < 4), add_slot * 8 + 4 + right, cap * 8)
    extc = extc.at[lidx].add(cnt, mode="drop")
    extc = extc.at[ridx].add(cnt, mode="drop")
    active = active & ~commit
    slot = jnp.where(active & (slot + 1 >= cap), 0, jnp.where(active, slot + 1, slot))
    return (keys, counts, extc, claim), active, slot


@jax.jit
def insert_batch_mw(table: MWShardTable, words, left, right, cnt, valid) -> MWShardTable:
    """words: [W, R] uint32; rest as shard_table.insert_batch."""
    cap = table.capacity
    R = words.shape[1]
    words = words.astype(U32)
    lane = jnp.arange(R, dtype=jnp.int32)
    cnt = cnt.astype(jnp.int32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)
    slot = (slot_hash_mw(words) % U32(cap)).astype(jnp.int32)
    active = valid

    tbl = (table.keys, table.counts, table.extc, table.claim)
    for _ in range(st._FULL_ROUNDS):
        tbl, active, slot = _probe_round_mw(
            tbl, (words, left, right, cnt, lane, active, slot)
        )

    S = max(R // st._COMPACT_FRACTION, 256)
    idx = jnp.nonzero(active, size=S, fill_value=0)[0]
    n_left = jnp.sum(active).astype(jnp.int32)
    s_rank = jnp.arange(S, dtype=jnp.int32)
    s_active = s_rank < jnp.minimum(n_left, S)
    sw = words[:, idx]
    sl, sr, sc, ss = left[idx], right[idx], cnt[idx], slot[idx]
    zero_v = (slot[0] & 0).astype(jnp.int32)

    def cond(state):
        _, active, _, it = state
        return jnp.any(active) & (it < MAX_PROBE - st._FULL_ROUNDS)

    def body(state):
        tbl, active, slot_s, it = state
        tbl, active, slot_s = _probe_round_mw(
            tbl, (sw, sl, sr, sc, s_rank, active, slot_s)
        )
        return tbl, active, slot_s, it + 1

    tbl, s_left, _, _ = jax.lax.while_loop(cond, body, (tbl, s_active, ss, zero_v))

    # full-width fallback for compaction-buffer overflow (no-op when empty)
    sel_mask = jnp.zeros((R,), bool).at[jnp.where(s_active, idx, R)].set(
        True, mode="drop"
    )
    fb_active = active & ~sel_mask

    def fb_body(state):
        tbl, active, slot_f, it = state
        tbl, active, slot_f = _probe_round_mw(
            tbl, (words, left, right, cnt, lane, active, slot_f)
        )
        return tbl, active, slot_f, it + 1

    tbl, fb_left, _, _ = jax.lax.while_loop(cond, fb_body, (tbl, fb_active, slot, zero_v))
    dropped = jnp.sum(s_left).astype(jnp.int32) + jnp.sum(fb_left).astype(jnp.int32)
    keys, counts, extc, claim = tbl
    return MWShardTable(
        keys=keys,
        counts=counts,
        extc=extc,
        claim=claim,
        num_dropped=table.num_dropped + dropped,
    )


class FinalizedMW(NamedTuple):
    keys: jax.Array  # [W, cap]
    counts: jax.Array
    left_ext: jax.Array
    right_ext: jax.Array
    keep: jax.Array
    num_kept: jax.Array
    sum_counts: jax.Array
    num_purged: jax.Array


@jax.jit
def _finalize_mw_jit(table: MWShardTable, dmin_lut: jax.Array) -> FinalizedMW:
    occupied = ~jnp.all(table.keys == EMPTY, axis=0)
    counts = jnp.minimum(table.counts, st.UINT16_MAX)
    extc = jnp.minimum(table.extc.reshape(-1, 8), st.UINT16_MAX)
    dmin = dmin_lut[jnp.clip(counts, 0, st.UINT16_MAX)]
    left = st._call_ext(extc[:, :4], dmin)
    right = st._call_ext(extc[:, 4:], dmin)
    keep = occupied & (counts >= 2) & (left < 4) & (right < 4)
    num_kept = jnp.sum(keep).astype(jnp.int64)
    sum_counts = jnp.sum(jnp.where(keep, counts, 0)).astype(jnp.int64)
    num_purged = jnp.sum(occupied).astype(jnp.int64) - num_kept
    return FinalizedMW(
        keys=jnp.where(keep[None, :], table.keys, EMPTY),
        counts=counts,
        left_ext=left,
        right_ext=right,
        keep=keep,
        num_kept=num_kept,
        sum_counts=sum_counts,
        num_purged=num_purged,
    )


def finalize_mw(table: MWShardTable, dmin_thres: int = 2) -> FinalizedMW:
    lut = jnp.asarray(st._dmin_lut(dmin_thres))
    return _finalize_mw_jit(table, lut)


def compact_to_host_mw(fin: FinalizedMW, k: int):
    """(kmer strings, counts, left chars, right chars) sorted by k-mer."""
    from ..ops.kmer_multiword import words_to_strings

    keep = np.asarray(fin.keep)
    words = [np.asarray(fin.keys[j])[keep] for j in range(fin.keys.shape[0])]
    counts = np.asarray(fin.counts)[keep]
    left = st._EXT_CHARS[np.asarray(fin.left_ext)[keep]]
    right = st._EXT_CHARS[np.asarray(fin.right_ext)[keep]]
    order = np.lexsort(tuple(reversed(words)))
    words = [w[order] for w in words]
    strings = words_to_strings(words, k)
    return strings, counts[order], left[order], right[order]
