"""Singleton-offload filter — the point_tcf two-choice-filter analogue.

The reference's --use-qf path (CUDA only; src/kcount/kcount-gpu/
tcf_wrapper.hpp:96-178, gpu_hash_table.cpp:442-467) sends the FIRST
occurrence of each k-mer into a compact GPU filter storing 6-bit packed
extensions at ~2.4 B/k-mer; a second occurrence promotes the k-mer into the
main table, replaying the stored extensions.  The main table is then sized
without error-kmer headroom (~50% memory saving at <1% cost,
docs/mhm_guide.md:337), at the price of "a negligible amount of variation in
kmer count results" (README_v2.md:91).

TPU version: a flat open-addressed fingerprint filter (8 B/slot: 32-bit
fingerprint + packed ext/count meta).  Batch flow per record lane:

  1. lookup-only probe of the main table: present -> scatter-add
  2. miss -> claim-probe of the filter: fingerprint match -> promotion set;
     empty -> store fingerprint + exts (the lane is done: first occurrence)
  3. promotion lanes insert into the main table (full claim insert); exactly
     one lane per filter entry (the claim winner) replays the stored exts
     and clears the filter slot

Exactness: a final match-only rescan lets fallback lanes promote entries
stored by same-batch duplicates (the reference GPU TCF races here and loses
the stored occurrence — part of its documented "negligible variation",
README_v2.md:91), and a 41-bit effective fingerprint (10 spare meta bits
verify promotions) makes distinct-k-mer merges ~2^-41 per chain pair.
Measured at 50k-read scale the QF output is bit-exact vs the oracle; the
residual collision probability is why exact-parity CI keeps --use-qf off,
as the reference's determinism notes prescribe (SURVEY §4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer_ops import fmix32, slot_hash
from . import shard_table as st
from .shard_table import EMPTY, MAX_PROBE, ShardTable

U32 = jnp.uint32
# scan bound: a stored first occurrence sitting beyond a truncated scan
# would be ORPHANED (its count permanently lost once the k-mer lands in the
# main table), so the bound must exceed any realistic cluster at the 0.66
# design load; 128 makes truncation astronomically rare while the
# while_loop still exits early on resolved lanes.  (The reference TCF's
# query is exact — bounded two-choice buckets — so it has no such path.)
FILTER_MAX_PROBE = 128
FILTER_ATTEMPTS = 4
FP_EMPTY = np.uint32(0xFFFFFFFF)
# promoted entries leave a tombstone so probe chains over them stay intact
# (classic open-addressing deletion; the reference TCF's backing store handles
# deletes inside poggers, point_tcf/README.md:44)
FP_TOMB = np.uint32(0xFFFFFFFE)
# meta word layout: left(3b) | right(3b)<<3 | count(16b)<<6 | fp2(10b)<<22 —
# the spare top bits carry a secondary fingerprint (41 distinguishing bits
# total; the reference TCF keys on a 64-bit kmer_hash)
META_FP2_SHIFT = 22
META_COUNT_MASK = 0xFFFF


class SingletonFilter(NamedTuple):
    fp: jax.Array  # [fcap] uint32 fingerprints (FP_EMPTY = free)
    meta: jax.Array  # [fcap] int32: left | right<<3 | count<<6
    claim: jax.Array  # [fcap] int32 scratch (-1)
    num_stored: jax.Array  # [] int32 (net occupancy is num_stored - promotions)

    @property
    def capacity(self) -> int:
        return self.fp.shape[0]


def create_filter(max_elems: int, load_factor: float = 0.66) -> SingletonFilter:
    fcap = st.next_prime(max(int(max_elems / load_factor), 11))
    return SingletonFilter(
        fp=jnp.full((fcap,), FP_EMPTY, dtype=U32),
        meta=jnp.zeros((fcap,), jnp.int32),
        claim=jnp.full((fcap,), -1, jnp.int32),
        num_stored=jnp.zeros((), jnp.int32),
    )


def _fingerprint(hi, lo):
    """Independent of slot_hash so (slot, fp) gives ~63 distinguishing bits;
    the top bit is cleared so fingerprints never collide with the EMPTY/TOMB
    sentinels."""
    f = fmix32(hi ^ U32(0xA5A5A5A5)) ^ fmix32(lo + U32(0x3C6EF372))
    return f & U32(0x7FFFFFFF)


def _fslot(hi, lo, fcap):
    return (fmix32(slot_hash(hi, lo) + U32(0x9E3779B9)) % U32(fcap)).astype(jnp.int32)


def _fingerprint2(hi, lo):
    """Secondary 10-bit fingerprint, independent of _fingerprint/_fslot."""
    f = fmix32(lo ^ U32(0x7FED7FED)) ^ fmix32(hi + U32(0x01234567))
    return (f & U32(0x3FF)).astype(jnp.int32)


def _fingerprint_mw(words):
    """Multi-word fingerprint ([W, R] -> [R]); like the reference's TCF the
    filter keys on a HASH of the full k-mer for any MAX_K
    (gpu_hash_table.cpp:441-446 uses kmer_hash(kmer) as the TCF key)."""
    f = jnp.full_like(words[0], 0xA5A5A5A5)
    for j in range(words.shape[0]):
        f = fmix32(f ^ words[j] ^ (U32(j) * U32(0x3C6EF372)))
    return f & U32(0x7FFFFFFF)


def _fingerprint2_mw(words):
    f = jnp.full_like(words[0], 0x7FED7FED)
    for j in range(words.shape[0]):
        f = fmix32(f ^ words[j] ^ (U32(j) * U32(0x01234567)))
    return (f & U32(0x3FF)).astype(jnp.int32)


def _filter_phase(filt: SingletonFilter, fps, fslot0, meta_mine, absent,
                  phase1_exhausted, valid, lane, zero_v, fps2=None):
    """Phases 2 of the QF insert, key-representation-agnostic: lookup-then-
    claim the fingerprint filter for absent lanes.  Returns
    (fp, meta, claim, promote, replayer, rmeta, f_left, n_stored).

    fps2: optional 10-bit secondary fingerprint carried in the meta word's
    spare bits (callers embed it at META_FP2_SHIFT); a chain-scan fp match
    must also match fps2 or the lane falls back to a direct main-table
    insert — 41 distinguishing bits instead of 31 at zero memory cost."""
    fcap = filt.capacity
    R = fps.shape[0]
    fp_arr, fmeta, fclaim = filt.fp, filt.meta, filt.claim
    f_active = absent
    promote = jnp.zeros((R,), bool) & valid
    replayer = jnp.zeros((R,), bool) & valid
    stored = jnp.zeros((R,), bool) & valid
    give_up = jnp.zeros((R,), bool) & valid
    pslot = jnp.full((R,), fcap, jnp.int32) + zero_v

    # chain slots scanned per while-round (one flat gather each).  4, not
    # 16: flat gathers turn superlinear past ~5M lanes on the target chip
    # (BASELINE.md round 5), and this scan runs at FULL batch width — FW=16
    # gathered 16R ~ 19.6M lanes per round and was a dominant term of the
    # first chip-scale --use-qf run's 18 s/batch collapse.
    FW = 4

    def scan_chain(fp_now, scanning):
        """Linear chain scan against the CURRENT fp array -> (match_slot,
        free_slot): walk from fslot0 to the first fp match or EMPTY, tracking
        the first free (EMPTY or tombstone) slot on the way.  WINDOWED: each
        while-round gathers FW consecutive chain slots in one flat [FW*R]
        gather and resolves them with a forward in-window sweep (candidate-
        major [R] slices — a [R, FW] layout pads the minor dim to the tile).
        FILTER_MAX_PROBE // FW rounds cover the full chain bound; the
        while exits as soon as no lane is still scanning.

        The body/cond closures are created FRESH per call: JAX caches
        while_loop body jaxprs by (function object, avals), so reusing one
        body function across calls silently replays the FIRST call's closure
        constants — a stale fp array here (jit-only divergence, found the
        hard way via an orphaned filter entry at 50k scale)."""
        match_slot = jnp.full((R,), fcap, jnp.int32) + zero_v
        free_slot = jnp.full((R,), fcap, jnp.int32) + zero_v

        def cond(state):
            return jnp.any(state[0]) & (state[-1] < FILTER_MAX_PROBE // FW)

        def body(state):
            scanning, fslot, match_slot, free_slot, it = state
            slot_c = []
            for c in range(FW):
                sc = jnp.mod(fslot + c, fcap)
                slot_c.append(jnp.where(scanning, sc, 0))
            fpf = fp_now[jnp.concatenate(slot_c)]
            still = scanning
            for c in range(FW):
                fpc = fpf[c * R:(c + 1) * R]
                is_empty = fpc == FP_EMPTY
                hit = still & (fpc == fps)
                free_here = (
                    still & (is_empty | (fpc == FP_TOMB)) & (free_slot == fcap)
                )
                free_slot = jnp.where(free_here, slot_c[c], free_slot)
                match_slot = jnp.where(hit, slot_c[c], match_slot)
                still = still & ~hit & ~is_empty
            fslot = jnp.mod(fslot + FW, fcap)
            return still, fslot, match_slot, free_slot, it + 1

        _, _, match_slot, free_slot, _ = jax.lax.while_loop(
            cond, body, (scanning, fslot0, match_slot, free_slot, zero_v)
        )
        return match_slot, free_slot

    for _attempt in range(FILTER_ATTEMPTS):
        # (a) lookup scan
        match_slot, free_slot = scan_chain(fp_arr, f_active)

        matched = f_active & (match_slot < fcap)
        if fps2 is not None:
            # secondary-fingerprint verification: a colliding entry must not
            # be promoted (it would consume another k-mer's stored occurrence
            # — the TCF's documented count-variation mechanism); mismatching
            # lanes take the lossless direct main-table insert instead
            mv = fmeta[jnp.where(matched, match_slot, 0)]
            fp2_ok = ((mv >> META_FP2_SHIFT) & 0x3FF) == fps2
            collided = matched & ~fp2_ok
            give_up = give_up | collided
            f_active = f_active & ~collided
            matched = matched & fp2_ok
        # (b1) promoters: one replayer per filter entry
        rslot = jnp.where(matched, match_slot, fcap)
        fclaim = fclaim.at[rslot].set(lane, mode="drop")
        g = jnp.where(matched, match_slot, 0)
        is_rep = matched & (fclaim[g] == lane)
        fclaim = fclaim.at[rslot].set(-1, mode="drop")
        promote = promote | matched
        replayer = replayer | is_rep
        pslot = jnp.where(matched, match_slot, pslot)
        # (b2) storers: claim the free slot
        want_store = f_active & ~matched & (free_slot < fcap)
        cslot = jnp.where(want_store, free_slot, fcap)
        fclaim = fclaim.at[cslot].set(lane, mode="drop")
        g2 = jnp.where(want_store, free_slot, 0)
        won = want_store & (fclaim[g2] == lane)
        fclaim = fclaim.at[cslot].set(-1, mode="drop")
        wslot = jnp.where(won, free_slot, fcap)
        fp_arr = fp_arr.at[wslot].set(fps, mode="drop")
        fmeta = fmeta.at[wslot].set(meta_mine, mode="drop")
        stored = stored | won
        # lanes without any free slot give up (handled by the main-table
        # fallback); claim losers retry next attempt
        give_up = give_up | (f_active & ~matched & (free_slot == fcap))
        f_active = f_active & ~matched & ~won & (free_slot < fcap)

    f_left = f_active | phase1_exhausted | give_up

    # final match-only rescan for the fallback lanes: a same-call duplicate
    # may have STORED this k-mer's first occurrence after the lane's last
    # scan (claim contention can burn all FILTER_ATTEMPTS).  Directly
    # inserting such a lane into the main table would ORPHAN that stored
    # occurrence — phase 1 hits main forever after, so the filter entry is
    # never promoted and the final count comes up one short (measured: 6 of
    # 491k counts at 50k-read scale before this pass).
    match_slot, _ = scan_chain(fp_arr, f_left)
    matched = f_left & (match_slot < fcap)
    if fps2 is not None:
        mv = fmeta[jnp.where(matched, match_slot, 0)]
        matched = matched & (((mv >> META_FP2_SHIFT) & 0x3FF) == fps2)
    rslot = jnp.where(matched, match_slot, fcap)
    fclaim = fclaim.at[rslot].set(lane, mode="drop")
    g = jnp.where(matched, match_slot, 0)
    is_rep = matched & (fclaim[g] == lane)
    fclaim = fclaim.at[rslot].set(-1, mode="drop")
    promote = promote | matched
    replayer = replayer | is_rep
    pslot = jnp.where(matched, match_slot, pslot)
    f_left = f_left & ~matched

    # replay contributions (gather before clearing)
    rmeta = jnp.where(replayer, fmeta[jnp.where(replayer, pslot, 0)], 0)
    # promoted entries become tombstones
    clear_slot = jnp.where(replayer, pslot, fcap)
    fp_arr = fp_arr.at[clear_slot].set(FP_TOMB, mode="drop")
    fmeta = fmeta.at[clear_slot].set(0, mode="drop")
    n_stored = jnp.sum(stored).astype(jnp.int32)
    return fp_arr, fmeta, fclaim, promote, replayer, rmeta, f_left, n_stored


def _compacted_insert(table: ShardTable, hi, lo, left, right, cnt, mask,
                      high_load: bool):
    """st.insert_batch over the masked lanes, COMPACTED to R/2 first
    (order-preserving _compact_sort) — the QF phase-3 insert populations
    are usually a small fraction of the batch, and the insert kernel's cost
    scales with its lane width.  Lanes beyond the compaction window (ramp-up
    batches where most of the batch promotes at once) go through a full-
    width insert behind a lax.cond — lossless, ~free when not taken."""
    import jax

    R = hi.shape[0]
    S = min(max(R // 2, 4096), R)
    meta = (left.astype(jnp.int32) | (right.astype(jnp.int32) << 3)
            | (jnp.minimum(cnt.astype(jnp.int32), 0xFFFF) << 6))
    (c_hi, c_lo, c_m), act, _, idx, n_left = st._compact_sort(
        [hi, lo, meta], mask, S)
    table = st.insert_batch(table, c_hi, c_lo, c_m & 7, (c_m >> 3) & 7,
                            c_m >> 6, act, high_load=high_load)

    def fb(tbl):
        sel = jnp.zeros((R,), bool).at[jnp.where(act, idx, R)].set(
            True, mode="drop")
        return st.insert_batch(tbl, hi, lo, left, right, cnt, mask & ~sel,
                               high_load=high_load)

    def nofb(tbl):
        return tbl

    return jax.lax.cond(n_left > S, fb, nofb, table)


@functools.partial(jax.jit, static_argnames=("high_load",))
def insert_batch_qf(table: ShardTable, filt: SingletonFilter,
                    hi, lo, left, right, cnt, valid, high_load: bool = False):
    """QF-mode insert: returns (table', filter').  high_load selects the
    main-table insert's loaded-tier layout (see shard_table.insert_batch)."""
    cap = table.capacity
    fcap = filt.capacity
    R = hi.shape[0]
    hi = hi.astype(U32)
    lo = lo.astype(U32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)
    cnt = cnt.astype(jnp.int32)
    lane = jnp.arange(R, dtype=jnp.int32)

    # ---- phase 1: lookup-only probe of the main table --------------------
    keys_hi, keys_lo = table.keys_hi, table.keys_lo
    counts, extc = table.counts, table.extc
    slot = (slot_hash(hi, lo) % U32(cap)).astype(jnp.int32)
    zero_v = (slot[0] & 0).astype(jnp.int32)
    active = valid
    absent = jnp.zeros((R,), bool) & valid
    found_slot = jnp.full((R,), cap, jnp.int32) + zero_v

    # windowed lookup (W candidates per round, one flat gather per key
    # plane): the main-table probe must follow the insert path's schedule.
    # W=4 at full batch width — wide flat gathers turn superlinear past
    # ~5M lanes on the target chip (W=16 here gathered 16R ~ 19.6M lanes
    # per round; BASELINE.md round 5), and probes 0-3 resolve ~alpha^4 of
    # lanes per round at load alpha.
    tri = st._probe_tri(cap)
    W = 4
    home = slot

    def body1b(state):
        active, absent, pidx, found_slot, it = state
        # candidate-major FLAT planes (no [R, W] tile padding — see
        # st._window_round)
        slot_c = []
        ok_c = []
        for c in range(W):
            p = pidx + c
            okc = active & (p < MAX_PROBE)
            sc = (home + tri[jnp.clip(p, 0, MAX_PROBE - 1)]) % cap
            slot_c.append(jnp.where(okc, sc, 0))
            ok_c.append(okc)
        flat = jnp.concatenate(slot_c)
        chi_f = keys_hi[flat]
        clo_f = keys_lo[flat]
        has = jnp.zeros((R,), bool)
        t_slot = jnp.zeros((R,), jnp.int32)
        t_is_m = jnp.zeros((R,), bool)
        for c in range(W - 1, -1, -1):
            chi = chi_f[c * R:(c + 1) * R]
            clo = clo_f[c * R:(c + 1) * R]
            m = ok_c[c] & (chi == hi) & (clo == lo)
            e = ok_c[c] & (chi == EMPTY) & (clo == EMPTY)
            intr = m | e
            has = has | intr
            t_slot = jnp.where(intr, slot_c[c], t_slot)
            t_is_m = jnp.where(intr, m, t_is_m)
        found_slot = jnp.where(t_is_m, t_slot, found_slot)
        absent = absent | (has & ~t_is_m)
        active = active & ~has
        pidx = pidx + W
        return active, absent, pidx, found_slot, it + 1

    def cond1b(state):
        active, _, _, _, it = state
        return jnp.any(active) & (it < -(-MAX_PROBE // W))

    active, absent, _, found_slot, _ = jax.lax.while_loop(
        cond1b, body1b, (active, absent, slot * 0, found_slot, zero_v)
    )
    # lanes that exhausted the lookup probe join the main-table fallback (the
    # full insert counts them as dropped properly instead of losing them)
    phase1_exhausted = active
    found = found_slot < cap
    add_slot = jnp.where(found, found_slot, cap)
    # counts are derived from the five left buckets (shard_table layout);
    # a hit lane lands in exactly one of buckets {0-3, 8}
    lidx = jnp.where(found, jnp.where(left < 4, left, 8) * cap + add_slot, cap * 9)
    ridx = jnp.where(found & (right < 4), (4 + right) * cap + add_slot, cap * 9)
    extc = extc.at[jnp.concatenate([lidx, ridx])].add(
        jnp.concatenate([cnt, cnt]), mode="drop"
    )

    # ---- phase 2: filter lookup-then-claim for absent lanes --------------
    # Each attempt: (a) probe the chain up to the first EMPTY, recording a
    # fingerprint match and the first free slot (EMPTY or tombstone); (b)
    # matched lanes promote (one replayer per entry), unmatched lanes claim
    # their free slot (claim losers retry the whole attempt).
    fps = _fingerprint(hi, lo)
    fps2 = _fingerprint2(hi, lo)
    fslot0 = _fslot(hi, lo, fcap)
    meta_mine = (left | (right << 3) | (jnp.minimum(cnt, 0xFFFF) << 6)
                 | (fps2 << META_FP2_SHIFT))
    fp_arr, fmeta, fclaim, promote, replayer, rmeta, f_left, n_stored = (
        _filter_phase(filt, fps, fslot0, meta_mine, absent, phase1_exhausted,
                      valid, lane, zero_v, fps2=fps2)
    )

    # ---- phase 3: promoted lanes insert into the main table --------------
    # own contribution for promote lanes; the replayer lane ALSO carries the
    # stored first-occurrence contribution; filter-exhausted lanes (f_left)
    # fall through to a direct main insert — no data loss, just no memory
    # saving for them.  The promote and f_left masks are disjoint and share
    # the (left, right, cnt) planes, so they merge into ONE insert; both
    # insert populations are usually a small fraction of the batch, so they
    # are COMPACTED to R/2 lanes first (the r5 first chip --use-qf run paid
    # three full-width insert programs per batch) with a lossless full-width
    # fallback behind a lax.cond for the ramp-up batches that overflow.
    table2 = ShardTable(
        keys_hi=keys_hi, keys_lo=keys_lo, counts=counts, extc=extc,
        claim=table.claim, num_dropped=table.num_dropped,
    )
    table2 = _compacted_insert(
        table2, hi, lo, left, right, cnt, promote | f_left,
        high_load=high_load)
    table2 = _compacted_insert(
        table2, hi, lo, rmeta & 7, (rmeta >> 3) & 7,
        (rmeta >> 6) & META_COUNT_MASK, replayer, high_load=high_load)

    filt2 = SingletonFilter(
        fp=fp_arr,
        meta=fmeta,
        claim=fclaim,
        num_stored=filt.num_stored + n_stored,
    )
    return table2, filt2


@functools.partial(jax.jit, static_argnames=("high_load",))
def insert_batch_qf_mw(table, filt: SingletonFilter, words, left, right, cnt,
                       valid, high_load: bool = False):
    """Multi-word (k > 32) QF-mode insert: returns (table', filter').

    Same three phases as insert_batch_qf with W-word key compares in phase 1;
    the filter itself keys on a 64-bit-quality fingerprint of the whole k-mer
    exactly like the reference's TCF (kmer_hash(kmer) for any MAX_K,
    gpu_hash_table.cpp:441-446)."""
    from . import shard_table_mw as stmw

    cap = table.capacity
    fcap = filt.capacity
    Wn = words.shape[0]
    R = words.shape[1]
    words = words.astype(U32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)
    cnt = cnt.astype(jnp.int32)
    lane = jnp.arange(R, dtype=jnp.int32)

    # ---- phase 1: lookup-only probe of the MW main table ------------------
    keys, counts, extc = table.keys, table.counts, table.extc
    slot = (stmw.slot_hash_mw(words) % U32(cap)).astype(jnp.int32)
    zero_v = (slot[0] & 0).astype(jnp.int32)
    active = valid
    absent = jnp.zeros((R,), bool) & valid
    found_slot = jnp.full((R,), cap, jnp.int32) + zero_v

    # windowed lookup (see the single-word insert_batch_qf phase 1; W=4 —
    # full-width W=16 windows gathered Wn x 16R lanes per round, superlinear
    # on the target chip, BASELINE.md round 5)
    tri = st._probe_tri(cap)
    W = 4
    home = slot

    def body1b(state):
        active, absent, pidx, found_slot, it = state
        # candidate-major FLAT planes (see the single-word phase 1)
        slot_c = []
        ok_c = []
        for c in range(W):
            p = pidx + c
            okc = active & (p < MAX_PROBE)
            sc = (home + tri[jnp.clip(p, 0, MAX_PROBE - 1)]) % cap
            slot_c.append(jnp.where(okc, sc, 0))
            ok_c.append(okc)
        flat = jnp.concatenate(slot_c)
        cw_f = [keys[j * cap + flat] for j in range(Wn)]
        has = jnp.zeros((R,), bool)
        t_slot = jnp.zeros((R,), jnp.int32)
        t_is_m = jnp.zeros((R,), bool)
        for c in range(W - 1, -1, -1):
            m = ok_c[c]
            e = ok_c[c]
            for j in range(Wn):
                cw = cw_f[j][c * R:(c + 1) * R]
                m = m & (cw == words[j])
                e = e & (cw == stmw.EMPTY)
            intr = m | e
            has = has | intr
            t_slot = jnp.where(intr, slot_c[c], t_slot)
            t_is_m = jnp.where(intr, m, t_is_m)
        found_slot = jnp.where(t_is_m, t_slot, found_slot)
        absent = absent | (has & ~t_is_m)
        active = active & ~has
        pidx = pidx + W
        return active, absent, pidx, found_slot, it + 1

    def cond1b(state):
        active, _, _, _, it = state
        return jnp.any(active) & (it < -(-MAX_PROBE // W))

    active, absent, _, found_slot, _ = jax.lax.while_loop(
        cond1b, body1b, (active, absent, slot * 0, found_slot, zero_v)
    )
    phase1_exhausted = active
    found = found_slot < cap
    add_slot = jnp.where(found, found_slot, cap)
    lidx = jnp.where(found, jnp.where(left < 4, left, 8) * cap + add_slot, cap * 9)
    ridx = jnp.where(found & (right < 4), (4 + right) * cap + add_slot, cap * 9)
    extc = extc.at[jnp.concatenate([lidx, ridx])].add(
        jnp.concatenate([cnt, cnt]), mode="drop"
    )

    # ---- phase 2: shared filter lookup-then-claim -------------------------
    fps = _fingerprint_mw(words)
    fps2 = _fingerprint2_mw(words)
    fslot0 = (fmix32(stmw.slot_hash_mw(words) + U32(0x9E3779B9)) % U32(fcap)).astype(jnp.int32)
    meta_mine = (left | (right << 3) | (jnp.minimum(cnt, 0xFFFF) << 6)
                 | (fps2 << META_FP2_SHIFT))
    fp_arr, fmeta, fclaim, promote, replayer, rmeta, f_left, n_stored = (
        _filter_phase(filt, fps, fslot0, meta_mine, absent, phase1_exhausted,
                      valid, lane, zero_v, fps2=fps2)
    )

    # ---- phase 3: promoted lanes insert into the MW main table ------------
    table2 = type(table)(
        keys=keys, counts=counts, extc=extc,
        claim=table.claim, num_dropped=table.num_dropped,
    )

    # disjoint-mask merge + R/2 compaction with lossless full-width
    # fallback, like the single-word _compacted_insert.  w0_full_range=True
    # is the conservative emptiness test (all words checked) — correct for
    # every k without threading k through the jit.
    def compacted_insert_mw(tbl, l_, r_, c_, mask):
        import jax as _jax

        S = min(max(R // 2, 4096), R)
        meta = (l_ | (r_ << 3) | (jnp.minimum(c_, 0xFFFF) << 6))
        arrs, act, _, idx, n_left = st._compact_sort([*words, meta], mask, S)
        sw = jnp.stack(arrs[:Wn], axis=0)
        sm = arrs[Wn]
        tbl = stmw.insert_batch_mw(tbl, sw, sm & 7, (sm >> 3) & 7, sm >> 6,
                                   act, w0_full_range=True,
                                   high_load=high_load)

        def fb(t):
            sel = jnp.zeros((R,), bool).at[jnp.where(act, idx, R)].set(
                True, mode="drop")
            return stmw.insert_batch_mw(t, words, l_, r_, c_, mask & ~sel,
                                        w0_full_range=True,
                                        high_load=high_load)

        def nofb(t):
            return t

        return _jax.lax.cond(n_left > S, fb, nofb, tbl)

    table2 = compacted_insert_mw(table2, left, right, cnt, promote | f_left)
    table2 = compacted_insert_mw(table2, rmeta & 7, (rmeta >> 3) & 7,
                                 (rmeta >> 6) & META_COUNT_MASK, replayer)

    filt2 = SingletonFilter(
        fp=fp_arr,
        meta=fmeta,
        claim=fclaim,
        num_stored=filt.num_stored + n_stored,
    )
    return table2, filt2


def filter_memory_bytes(filt: SingletonFilter) -> int:
    return int(filt.fp.nbytes + filt.meta.nbytes + filt.claim.nbytes)


def filter_occupancy(filt: SingletonFilter) -> int:
    return int((np.asarray(filt.fp) != 0xFFFFFFFF).sum())
