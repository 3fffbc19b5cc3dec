"""Point queries against the shard table (KmerDHT::kmer_exists /
get_kmer_count, src/kcount/kmer_dht.cpp:216-245).

The reference resolves each query with a blocking RPC to the owner rank; here
queries are batched, canonicalized, routed (same minimizer function), and
resolved with a vectorized probe-read — no writes, same probe schedule as the
insert path (shard_table._advance) so any present key is found.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer_ops import slot_hash
from .shard_table import CTG_BIT, EMPTY, MAX_PROBE, ShardTable, _advance

U32 = jnp.uint32


@jax.jit
def lookup_batch(table: ShardTable, hi, lo):
    """Return per-query (found, count16, left4, right4 ext-count rows).

    hi/lo must already be canonical k-mer pairs belonging to this shard.
    """
    cap = table.capacity
    hi = hi.astype(U32)
    lo = lo.astype(U32)
    Q = hi.shape[0]
    slot = (slot_hash(hi, lo) % U32(cap)).astype(jnp.int32)
    found_slot = jnp.full((Q,), cap, jnp.int32)
    active = jnp.ones((Q,), bool)

    def cond(state):
        active, _, _, it = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        active, slot, found_slot, it = state
        gslot = jnp.where(active, slot, 0)
        thi = table.keys_hi[gslot]
        tlo = table.keys_lo[gslot]
        hit = active & (thi == hi) & (tlo == lo)
        empty = active & (thi == EMPTY) & (tlo == EMPTY)
        found_slot = jnp.where(hit, slot, found_slot)
        active = active & ~hit & ~empty
        slot = _advance(slot, active, it + 1, cap)
        return active, slot, found_slot, it + 1

    zero_v = (slot[0] & 0).astype(jnp.int32)
    _, _, found_slot, _ = jax.lax.while_loop(
        cond, body, (active, slot, found_slot, zero_v)
    )
    found = found_slot < cap
    g = jnp.where(found, found_slot, 0)
    # read entries derive their count from the five left-ext buckets; ctg
    # entries carry depth in the counts word (see shard_table layout)
    ext_raw = table.extc.reshape(-1, 9)[g]
    derived = jnp.sum(ext_raw[:, :4], axis=1) + ext_raw[:, 8]
    cur = table.counts[g]
    cnt = jnp.where((cur & CTG_BIT) != 0, cur & (CTG_BIT - 1), derived)
    counts = jnp.where(found, jnp.minimum(cnt, 65535), 0)
    extc = jnp.where(found[:, None], ext_raw[:, :8], 0)
    return found, counts, extc


def get_kmer_counts(table: ShardTable, kmers: list, k: int) -> list:
    """Host-convenience: query canonical counts for k-mer strings (k <= 32)."""
    from ..oracle import canonical_val, kmer_to_val

    vals = [canonical_val(kmer_to_val(s), k)[0] for s in kmers]
    hi = jnp.asarray([v >> 32 for v in vals], dtype=jnp.uint32)
    lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], dtype=jnp.uint32)
    found, counts, _ = lookup_batch(table, hi, lo)
    return [int(c) if f else 0 for f, c in zip(np.asarray(found), np.asarray(counts))]


@jax.jit
def lookup_batch_mw(table, words):
    """Multi-word (k > 32) point lookup: words is the [W, Q] canonical word
    stack (word 0 = leading r bases right-aligned, then 16-base words — the
    MWShardTable key layout).  Returns (found, count16, ext rows)."""
    from .shard_table_mw import slot_hash_mw

    cap = table.capacity
    Wn, Q = words.shape
    slot = (slot_hash_mw(words) % U32(cap)).astype(jnp.int32)
    found_slot = jnp.full((Q,), cap, jnp.int32)
    active = jnp.ones((Q,), bool)

    def cond(state):
        active, _, _, it = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        active, slot, found_slot, it = state
        gslot = jnp.where(active, slot, 0)
        # flat per-word gathers (see shard_table_mw._probe_round_mw for why
        # the [W, cap] axis-1 form is avoided); one gather per word also
        # makes all-EMPTY the safe emptiness test for every k
        hit = active
        empty = active
        for j in range(Wn):
            tw = table.keys[j * cap + gslot]
            hit = hit & (tw == words[j])
            empty = empty & (tw == EMPTY)
        found_slot = jnp.where(hit, slot, found_slot)
        active = active & ~hit & ~empty
        slot = _advance(slot, active, it + 1, cap)
        return active, slot, found_slot, it + 1

    zero_v = (slot[0] & 0).astype(jnp.int32)
    _, _, found_slot, _ = jax.lax.while_loop(
        cond, body, (active, slot, found_slot, zero_v)
    )
    found = found_slot < cap
    g = jnp.where(found, found_slot, 0)
    ext_raw = table.extc.reshape(-1, 9)[g]
    derived = (jnp.sum(ext_raw[:, :4], axis=1) + ext_raw[:, 8]).astype(jnp.int32)
    cur = table.counts[g]
    cnt = jnp.where((cur & CTG_BIT) != 0, cur & (CTG_BIT - 1), derived)
    counts = jnp.where(found, jnp.minimum(cnt, 65535), 0)
    extc = jnp.where(found[:, None], ext_raw[:, :8], 0)
    return found, counts, extc


def val_to_words(v: int, k: int) -> list:
    """Canonical k-mer value -> the MWShardTable word list (word 0 = leading
    r = k-16(W-1) bases right-aligned, then 16-base words)."""
    Wn = (k + 15) // 16
    out = []
    for j in range(Wn):
        out.append((v >> (32 * (Wn - 1 - j))) & 0xFFFFFFFF)
    return out


def get_kmer_counts_sharded(state, kmers: list, k: int, n_shards: int) -> list:
    """Sharded point queries — the KmerDHT::get_kmer_count RPC analogue
    (src/kcount/kmer_dht.cpp:231-245): canonicalize, route by the minimizer
    hash, and resolve each query on its owner shard's table.

    state: a parallel.count_step ShardedState (k <= 32) or MWShardedState
    (k > 32); the --use-qf wrapper states are unwrapped to their main table
    (a filter-resident first occurrence is simply not countable yet, like a
    reference TCF-resident singleton).  Host-visible arrays.
    """
    from ..oracle import canonical_val, kmer_target_shard, kmer_to_val
    from .shard_table import ShardTable

    state = getattr(state, "table", state)
    multiword = not hasattr(state, "keys_hi")
    routed: dict = {}
    for qi, s in enumerate(kmers):
        cv = canonical_val(kmer_to_val(s), k)[0]
        shard = kmer_target_shard(cv, k, n_shards)
        routed.setdefault(shard, []).append((qi, cv))
    out = [0] * len(kmers)
    for shard, items in routed.items():
        # index through jnp so sharded (device-resident) state gathers
        # correctly regardless of layout
        if multiword:
            from .shard_table_mw import MWShardTable

            local = MWShardTable(
                keys=jnp.asarray(state.keys)[shard],
                counts=jnp.asarray(state.counts)[shard],
                extc=jnp.asarray(state.extc)[shard],
                claim=jnp.asarray(state.claim)[shard],
                num_dropped=jnp.zeros((), jnp.int32),
            )
            words = jnp.asarray(
                [[val_to_words(cv, k)[j] for _, cv in items]
                 for j in range((k + 15) // 16)],
                dtype=jnp.uint32,
            )
            found, counts, _ = lookup_batch_mw(local, words)
        else:
            local = ShardTable(
                keys_hi=jnp.asarray(state.keys_hi)[shard],
                keys_lo=jnp.asarray(state.keys_lo)[shard],
                counts=jnp.asarray(state.counts)[shard],
                extc=jnp.asarray(state.extc)[shard],
                claim=jnp.asarray(state.claim)[shard],
                num_dropped=jnp.zeros((), jnp.int32),
            )
            hi = jnp.asarray([cv >> 32 for _, cv in items], dtype=jnp.uint32)
            lo = jnp.asarray([cv & 0xFFFFFFFF for _, cv in items], dtype=jnp.uint32)
            found, counts, _ = lookup_batch(local, hi, lo)
        for (qi, _), f, c in zip(items, np.asarray(found), np.asarray(counts)):
            out[qi] = int(c) if f else 0
    return out
