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
    ext_raw = jnp.stack([table.extc[b * cap + g] for b in range(9)], axis=1)
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
    ext_raw = jnp.stack([table.extc[b * cap + g] for b in range(9)], axis=1)
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


def _probe_local_planes(khi, klo, counts, extc, qh, ql, mark):
    """Probe-read queries against LOCAL table planes (the shard_map serve
    function of the collective query path) — same schedule as lookup_batch."""
    cap = khi.shape[0]
    Q = qh.shape[0]
    slot = (slot_hash(qh, ql) % U32(cap)).astype(jnp.int32)
    # derive the carry from `slot` so its varying-axes type matches inside
    # shard_map (a fresh constant is device-invariant and breaks while_loop)
    found_slot = (slot & 0) + cap
    active = mark

    def cond(state):
        active, _, _, it = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        active, slot, found_slot, it = state
        gslot = jnp.where(active, slot, 0)
        thi = khi[gslot]
        tlo = klo[gslot]
        hit = active & (thi == qh) & (tlo == ql)
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
    ext_raw = jnp.stack([extc[b * cap + g] for b in range(9)], axis=1)
    derived = jnp.sum(ext_raw[:, :4], axis=1) + ext_raw[:, 8]
    cur = counts[g]
    cnt = jnp.where((cur & CTG_BIT) != 0, cur & (CTG_BIT - 1), derived)
    cnt = jnp.where(found, jnp.minimum(cnt, 65535), 0)
    return found.astype(jnp.int32), cnt.astype(jnp.int32)


def _probe_local_planes_mw(keys_flat, counts, extc, rwords, mark, n_words: int):
    """Multi-word form of _probe_local_planes (rwords: list of W planes)."""
    from .shard_table_mw import slot_hash_mw

    cap = counts.shape[0]
    Q = rwords[0].shape[0]
    words = jnp.stack(rwords)
    slot = (slot_hash_mw(words) % U32(cap)).astype(jnp.int32)
    found_slot = (slot & 0) + cap  # varying-typed carry (see _probe_local_planes)
    active = mark

    def cond(state):
        active, _, _, it = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        active, slot, found_slot, it = state
        gslot = jnp.where(active, slot, 0)
        hit = active
        empty = active
        for j in range(n_words):
            tw = keys_flat[j * cap + gslot]
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
    ext_raw = jnp.stack([extc[b * cap + g] for b in range(9)], axis=1)
    derived = jnp.sum(ext_raw[:, :4], axis=1) + ext_raw[:, 8]
    cur = counts[g]
    cnt = jnp.where((cur & CTG_BIT) != 0, cur & (CTG_BIT - 1), derived)
    cnt = jnp.where(found, jnp.minimum(cnt, 65535), 0)
    return found.astype(jnp.int32), cnt.astype(jnp.int32)


def _collective_query(state, vals: list, k: int, n_shards: int) -> list:
    """Multi-process point queries: each process queries its OWN k-mer list;
    queries ride the shared capped rr_exchange to their owner shard and the
    owner probe-reads its local table planes — the any-rank RPC get of
    KmerDHT::get_kmer_count (src/kcount/kmer_dht.cpp:216-245), collectivized.

    vals: this process's canonical k-mer values (any k; k > 32 ships W-word
    query planes, routed by the multiword minimizer).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import distributed as dist
    from ..parallel.exchange import rr_exchange

    multiword = not hasattr(state, "keys_hi")
    key0 = state.keys if multiword else state.keys_hi
    mesh = key0.sharding.mesh
    Qp = max(dist.allmax(len(vals)), 1)
    Wn = (k + 15) // 16 if multiword else 2
    # row-local query planes: this process's queries live (valid) only on its
    # FIRST local row; other rows carry padding
    local_rows = len(mesh.local_devices)
    qw_l = np.zeros((Wn, local_rows, Qp), np.uint32)
    qv_l = np.zeros((local_rows, Qp), bool)
    for i, v in enumerate(vals):
        if multiword:
            for j, w in enumerate(val_to_words(v, k)):
                qw_l[j, 0, i] = w
        else:
            qw_l[0, 0, i] = v >> 32
            qw_l[1, 0, i] = v & 0xFFFFFFFF
        qv_l[0, i] = True
    sharding = NamedSharding(mesh, P("sh"))
    cap_x = max(256, 4 * Qp // n_shards + 64)

    if multiword:
        from ..ops.kmer_multiword import route_kmer_words

        def route(planes):
            return route_kmer_words(planes, k, n_shards)

        def serve_with(keys_flat, counts, extc):
            def serve(mark, *rw):
                return list(_probe_local_planes_mw(
                    keys_flat, counts, extc, list(rw), mark, Wn))
            return serve

        table_planes = (state.keys, state.counts, state.extc)
    else:
        from ..contig.device import route_kmer_pairs
        from ..ops.kmer_ops import minimizer_len_for_k

        m = minimizer_len_for_k(k)

        def route(planes):
            return route_kmer_pairs(planes[0], planes[1], k, m, n_shards)

        def serve_with(khi, klo, counts, extc):
            def serve(mark, rh, rl):
                return list(_probe_local_planes(khi, klo, counts, extc, rh, rl, mark))
            return serve

        table_planes = (state.keys_hi, state.keys_lo, state.counts, state.extc)

    n_tbl = len(table_planes)

    def per_device(*args):
        tbl = [a.reshape(-1) for a in args[:n_tbl]]
        qplanes = [a.reshape(-1) for a in args[n_tbl:-1]]
        qv = args[-1].reshape(-1)
        owner = route(qplanes)
        f, c = rr_exchange(qplanes, owner, n_shards, cap_x, serve_with(*tbl),
                           [jnp.int32, jnp.int32], valid=qv)
        return f[None], c[None]

    n_in = n_tbl + Wn + 1
    fn = jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(P("sh"),) * n_in, out_specs=(P("sh"),) * 2,
    ))
    f, c = fn(
        *table_planes,
        *[dist.make_global(sharding, qw_l[j]) for j in range(Wn)],
        dist.make_global(sharding, qv_l),
    )
    # answers for this process's queries sit on its first local row
    first = dict(dist.local_shard_items(f))
    firstc = dict(dist.local_shard_items(c))
    row = min(first)
    fr, cr = np.asarray(first[row]), np.asarray(firstc[row])
    return [int(cr[i]) if fr[i] else 0 for i in range(len(vals))]


def get_kmer_counts_sharded(state, kmers: list, k: int, n_shards: int) -> list:
    """Sharded point queries — the KmerDHT::get_kmer_count RPC analogue
    (src/kcount/kmer_dht.cpp:231-245): canonicalize, route by the minimizer
    hash, and resolve each query on its owner shard's table.

    state: a parallel.count_step ShardedState (k <= 32) or MWShardedState
    (k > 32); the --use-qf wrapper states are unwrapped to their main table
    (a filter-resident first occurrence is simply not countable yet, like a
    reference TCF-resident singleton).

    Multi-process: every process calls this collectively with its OWN query
    list (k <= 32 rides the rr_exchange; the reference's query works from any
    rank the same way).  Single-process resolves locally, no collectives.
    """
    from ..oracle import canonical_val, kmer_target_shard, kmer_to_val
    from .shard_table import ShardTable

    state = getattr(state, "table", state)
    multiword = not hasattr(state, "keys_hi")
    if jax.process_count() > 1:
        # k <= 32 ships u32 pairs; k > 32 ships W canonical word planes routed
        # by the multiword minimizer (same wire the mw traversal lookup rides,
        # contig/device.py) — the reference's get works from any rank at every
        # templated k (src/kcount/kmer_dht.cpp:216-245, MAX_K to 160).
        vals = [canonical_val(kmer_to_val(s), k)[0] for s in kmers]
        return _collective_query(state, vals, k, n_shards)
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
