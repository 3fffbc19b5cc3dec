"""Multi-word shard table for k > 32 (keys are [W, cap] uint32 stacks).

Same vectorized claim-free probe insert as shard_table.py (see there for the
design rationale vs the reference's CPU linear probe and GPU CAS kernels)
with W-word key compares; word 0 is the election word — empties scatter it,
the re-gather names each slot's winner, and only winners write the remaining
words, so multi-word keys can never interleave (the reference GPU kernel
needs its KEY_TRANSITION two-phase CAS for exactly this,
src/kcount/kcount-gpu/gpu_hash_table.cpp:368-424).  Counts use the same
9-bucket fold as shard_table (bucket 8 = invalid left ext; count = sum of
the five left buckets at finalize).
"""

from __future__ import annotations

import functools
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
    keys: jax.Array  # FLAT [W*cap] uint32 (word j's slot s at j*cap + s)
    counts: jax.Array  # [cap] int32 (ctg-pass only; read counts derived)
    extc: jax.Array  # [9*cap] int32, bucket-major (see shard_table.ShardTable)
    claim: jax.Array  # [cap] int32 (scratch kept for layout parity)
    num_dropped: jax.Array  # [] int32

    # keys are stored flat so the insert scan carry never crosses a reshape
    # (a [W, cap]<->[W*cap] reshape at the jit/scan boundary defeats XLA's
    # in-place carry aliasing and costs a full table copy per sweep)
    @property
    def capacity(self) -> int:
        return self.claim.shape[0]

    @property
    def n_words(self) -> int:
        return self.keys.shape[0] // self.claim.shape[0]


def create(max_elems: int, n_words: int, load_factor: float = st.TARGET_LOAD_FACTOR) -> MWShardTable:
    cap = st.next_prime(max(int(max_elems / load_factor), 11))
    return MWShardTable(
        keys=jnp.full((n_words * cap,), EMPTY, dtype=U32),
        counts=jnp.zeros((cap,), jnp.int32),
        extc=jnp.zeros((cap * 9,), jnp.int32),
        claim=jnp.full((cap,), -1, jnp.int32),
        num_dropped=jnp.zeros((), jnp.int32),
    )


def slot_hash_mw(words: jax.Array) -> jax.Array:
    """Fold fmix32 over the W words ([W, R] -> [R])."""
    h = jnp.zeros_like(words[0]) ^ U32(0x5BD1E995)
    for j in range(words.shape[0]):
        h = fmix32(h ^ words[j] ^ (U32(j) * U32(0x9E3779B9)))
    return h


def probe_stats_device_mw(keys_flat, n_words: int) -> dict:
    """Device-side probe/load stats for a sharded multi-word table's
    [n_shards, W*cap] flat key planes (mirror of st.probe_stats_device):
    a few scalars per shard D2H, never the keys."""
    import numpy as np

    from ..parallel import distributed as dist

    S, WC = keys_flat.shape
    cap = WC // n_words

    @jax.jit
    def f(keys):
        kw = keys.reshape(S, n_words, cap)
        occ = jnp.zeros((S, cap), bool)
        for j in range(n_words):
            occ |= kw[:, j, :] != EMPTY
        # slot hash over the word axis (elementwise: keys are slot-aligned)
        h = jnp.zeros((S, cap), U32) ^ U32(0x5BD1E995)
        for j in range(n_words):
            h = fmix32(h ^ kw[:, j, :] ^ (U32(j) * U32(0x9E3779B9)))
        home = (h % U32(cap)).astype(jnp.int32)
        slot = jax.lax.broadcasted_iota(jnp.int32, (S, cap), 1)
        disp = jnp.mod(slot - home, cap)
        ts, od = st._probe_tri_tables(cap)
        pos = jnp.clip(jnp.searchsorted(ts, disp.reshape(-1)), 0, MAX_PROBE - 1)
        probe = jnp.where(
            ts[pos] == disp.reshape(-1), od[pos], MAX_PROBE
        ).reshape(S, cap) + 1
        probe = jnp.where(occ, probe, 0)
        return (
            jnp.sum(occ, axis=-1).astype(jnp.int64),
            jnp.sum(probe, axis=-1).astype(jnp.int64),
            jnp.max(probe, axis=-1).astype(jnp.int32),
        )

    n, sump, maxp = f(keys_flat)
    n = dist.fetch(n).astype(np.int64)
    sump = dist.fetch(sump).astype(np.int64)
    maxp = dist.fetch(maxp).astype(np.int64)
    return {
        "occupied": n,
        "load_factor": n / cap,
        "avg_probe": np.where(n > 0, sump / np.maximum(n, 1), 0.0),
        "max_probe": maxp,
    }


def _probe_round_mw(tbl, recs, w0_full_range: bool, cap: int, step=1):
    """One synchronized probe sweep (multi-word port of st._probe_round).

    Same measured-cost design as the k<=32 path: emptiness from the word-0
    gather alone when word 0 cannot be all-ones for a stored key (it holds
    the r = k-16(W-1) leading bases right-aligned, so r < 16 leaves zero
    slack bits — ``w0_full_range`` is k%16==0, the analogue of
    full_hi_range at k=32); pre-existing matches fall out of the single
    post-write verification gather; claim-free two-phase key write with
    word 0 as the election word (see st._probe_round).

    ``keys`` here is the FLAT [W*cap] view (word j's slot s at j*cap + s):
    every gather/scatter is 1-D with scalar-free indices, the same access
    pattern as the fast k<=32 path.  The batched-axis form (keys[W, cap]
    indexed on axis 1) lowers to a batched scatter/gather that this TPU
    stack executes ~80x slower and faults under lax.scan."""
    keys, counts, extc, claim = tbl
    words, left, right, cnt, lane, active, slot = recs
    Wn = words.shape[0]
    INVALID = Wn * cap  # out-of-range for every word offset (drop sentinel)
    gslot = jnp.where(active, slot, 0)
    tw0 = keys[gslot]
    if w0_full_range:
        is_empty = tw0 == EMPTY
        for j in range(1, Wn):
            is_empty &= keys[j * cap + gslot] == EMPTY
        is_empty &= active
    else:
        is_empty = active & (tw0 == EMPTY)
    # claim-free election: empties scatter word 0; the re-gather names each
    # slot's winner; only winners write the remaining words — a slot can
    # never hold an interleaved key (ties on (slot, word0) resolve to
    # whichever remaining-words write lands, a consistent key either way),
    # and word 0 is always completed to a full key within the sweep.
    e_slot = jnp.where(is_empty, slot, INVALID)
    keys = keys.at[e_slot].set(words[0], mode="drop")
    tw0 = keys[gslot]
    won0 = is_empty & (tw0 == words[0])
    w_slot = jnp.where(won0, slot, INVALID)
    commit = active & (tw0 == words[0])
    for j in range(1, Wn):
        keys = keys.at[j * cap + w_slot].set(words[j], mode="drop")
    # post-write verification: winners, pre-existing matches, and duplicate
    # lanes of a winner's k-mer all commit here (tw0 is current — no word-0
    # write happened after its gather)
    for j in range(1, Wn):
        commit &= keys[j * cap + gslot] == words[j]
    add_slot = jnp.where(commit, slot, cap)
    # 9-bucket count-fold: every committed lane lands in one of the five
    # left buckets, so counts need no scatter of their own
    lidx = jnp.where(commit, jnp.where(left < 4, left, 8) * cap + add_slot, cap * 9)
    ridx = jnp.where(commit & (right < 4), (4 + right) * cap + add_slot, cap * 9)
    # one concatenated scatter-add (op cost is flat in lane width)
    extc = extc.at[jnp.concatenate([lidx, ridx])].add(
        jnp.concatenate([cnt, cnt]), mode="drop"
    )
    active = active & ~commit
    slot = st._advance(slot, active, step, cap)
    return (keys, counts, extc, claim), active, slot


def _window_round_mw(tbl, recs, tri, w0_full_range: bool, cap: int, W: int):
    """Windowed probe round for the multi-word table (port of
    st._window_round; see there for the first-interesting-candidate
    correctness argument).  Gathers all Wn words of the W candidate slots
    per active lane (Wn flat gathers of W*R lanes — table-op cost is flat in
    lane width on the target chip, so rounds, not lanes, are the cost)."""
    keys, counts, extc, claim = tbl
    words, left, right, cnt, active, pidx, home = recs
    Wn, R = words.shape
    INVALID = Wn * cap
    # candidate-major FLAT planes (see st._window_round: [R, W] 2-D layouts
    # pad the minor dim to the 128-lane tile, 8-32x wasted VPU work)
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
    tgt_slot = jnp.zeros((R,), jnp.int32)
    tgt_p = pidx
    tgt_empty = jnp.zeros((R,), bool)
    for c in range(W - 1, -1, -1):
        m = ok_c[c]
        for j in range(Wn):
            m = m & (cw_f[j][c * R:(c + 1) * R] == words[j])
        if w0_full_range:
            e = ok_c[c]
            for j in range(Wn):
                e = e & (cw_f[j][c * R:(c + 1) * R] == EMPTY)
        else:
            e = ok_c[c] & (cw_f[0][c * R:(c + 1) * R] == EMPTY)
        intr = m | e
        has = has | intr
        tgt_slot = jnp.where(intr, slot_c[c], tgt_slot)
        tgt_p = jnp.where(intr, pidx + c, tgt_p)
        tgt_empty = jnp.where(intr, e, tgt_empty)
    # two-phase write with word 0 as the election word (see _probe_round_mw)
    e_slot = jnp.where(tgt_empty, tgt_slot, INVALID)
    keys = keys.at[e_slot].set(words[0], mode="drop")
    gslot = jnp.where(has, tgt_slot, 0)
    tw0 = keys[gslot]
    won0 = tgt_empty & (tw0 == words[0])
    w_slot = jnp.where(won0, tgt_slot, INVALID)
    commit = has & (tw0 == words[0])
    for j in range(1, Wn):
        keys = keys.at[j * cap + w_slot].set(words[j], mode="drop")
    for j in range(1, Wn):
        commit = commit & (keys[j * cap + gslot] == words[j])
    add_slot = jnp.where(commit, tgt_slot, cap)
    lidx = jnp.where(commit, jnp.where(left < 4, left, 8) * cap + add_slot, cap * 9)
    ridx = jnp.where(commit & (right < 4), (4 + right) * cap + add_slot, cap * 9)
    extc = extc.at[jnp.concatenate([lidx, ridx])].add(
        jnp.concatenate([cnt, cnt]), mode="drop"
    )
    pidx = jnp.where(has, tgt_p, pidx + W)
    survive = active & ~commit
    active = survive & (pidx < MAX_PROBE)
    n_exhausted = jnp.sum(survive & (pidx >= MAX_PROBE)).astype(jnp.int32)
    return (keys, counts, extc, claim), active, pidx, n_exhausted


@functools.partial(jax.jit, static_argnames=("w0_full_range", "high_load"))
def insert_batch_mw(table: MWShardTable, words, left, right, cnt, valid,
                    w0_full_range: bool = True,
                    high_load: bool = False) -> MWShardTable:
    """words: [W, R] uint32; rest as shard_table.insert_batch.

    Same load-adaptive compaction-cascade structure as
    shard_table.insert_batch (see there): high_load=False -> R/8 sweep +
    R/64 windowed while; high_load=True -> ONE full-width W=4 windowed
    round from probe 0 + R/4 windowed while (survivors after 4 probes are
    ~alpha^4 — the r4 sweep1+R/2 layout overflowed into the full-width
    fallback every batch past ~0.5 load, and W=8 first rounds lose 3x to
    superlinear wide-gather cost; see shard_table.insert_batch).
    Lossless full-width W=4 fallback behind a lax.cond if a compaction
    buffer overflows.  ``w0_full_range=False`` (safe only when k%16 != 0)
    enables the single-word emptiness probe (see _probe_round_mw)."""
    cap = table.capacity
    Wn, R = words.shape
    words = words.astype(U32)
    lane = jnp.arange(R, dtype=jnp.int32)
    cnt = cnt.astype(jnp.int32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)
    slot0 = (slot_hash_mw(words) % U32(cap)).astype(jnp.int32)
    active = valid

    tbl = (table.keys, table.counts, table.extc, table.claim)
    tri = st._probe_tri(cap)
    zero_v = (slot0[0] & 0).astype(jnp.int32)

    if high_load:
        # ONE full-width W=4 windowed round from probe 0, with a packed
        # meta plane for the single compaction that follows
        tbl, act0, p0, d1 = _window_round_mw(
            tbl, (words, left, right, cnt, active, slot0 * 0, slot0), tri,
            w0_full_range, cap, 4,
        )
        S2 = min(max(R // 4, 4096), R)
        meta = (left | (right << 3) | (jnp.minimum(cnt, 0xFFFF) << 6))
        arrs2, act2, rank2, idx2, n_left2 = st._compact_sort(
            [*words, meta, slot0, p0], act0, S2
        )
        t_w = jnp.stack(arrs2[:Wn], axis=0)
        t_m, t_h0, t_p = arrs2[Wn:]
        t_l, t_r, t_c = t_m & 7, (t_m >> 3) & 7, t_m >> 6
        entr_p = t_p
        pre_drops = d1
    else:
        # tier-1 compaction + one sweep (slot0 rides along for the windowed
        # tier-2, which probes from home + probe index)
        tbl, active, slot = _probe_round_mw(
            tbl, (words, left, right, cnt, lane, active, slot0),
            w0_full_range, cap, step=1,
        )
        S1 = min(max(R // 8, 4096), R)
        arrs1, act1, rank1, idx1, n_left1 = st._compact_sort(
            [*words, left, right, cnt, slot, slot0], active, S1
        )
        s_w = jnp.stack(arrs1[:Wn], axis=0)
        s_l, s_r, s_c, s_sl, s_h0 = arrs1[Wn:]
        tbl, act1b, s_sl = _probe_round_mw(
            tbl, (s_w, s_l, s_r, s_c, rank1, act1, s_sl), w0_full_range, cap, step=2
        )
        S2 = min(max(R // 64, 1024), S1)
        arrs2, act2, rank2, idx2, n_left2 = st._compact_sort(
            [*s_w, s_l, s_r, s_c, s_h0], act1b, S2
        )
        t_w = jnp.stack(arrs2[:Wn], axis=0)
        t_l, t_r, t_c, t_h0 = arrs2[Wn:]
        # entrants sit at probe index 2 (advanced by sweeps 1 and 2)
        entr_p = t_h0 * 0 + 2
        pre_drops = zero_v

    def cond(state):
        return jnp.any(state[1]) & (state[3] < MAX_PROBE)

    def body(state):
        tbl, act, pidx, it, drops = state
        tbl, act, pidx, nex = _window_round_mw(
            tbl, (t_w, t_l, t_r, t_c, act, pidx, t_h0), tri,
            w0_full_range, cap, st.PROBE_WINDOW,
        )
        return tbl, act, pidx, it + 1, drops + nex

    tbl, t_left, _, _, w_drops = jax.lax.while_loop(
        cond, body, (tbl, act2, entr_p, zero_v, pre_drops)
    )

    # lanes that overflowed a compaction tier rewalk at full width —
    # lossless, free (lax.cond) when not taken; restart cannot re-commit
    # already-committed lanes (not in set).  Entry probe index must never
    # skip a lane's unexamined probes (see shard_table.insert_batch): the
    # high_load path re-enters at each lane's carried index from the W=4
    # round; the low-load path rewalks from probe 1.
    if high_load:
        overflow = n_left2 > S2

        def fb_lanes():
            sel = jnp.zeros((R,), bool).at[jnp.where(act2, idx2, R)].set(True, mode="drop")
            return act0 & ~sel, p0
    else:
        overflow = (n_left1 > S1) | (n_left2 > S2)

        def fb_lanes():
            sel1 = jnp.zeros((R,), bool).at[jnp.where(act1, idx1, R)].set(True, mode="drop")
            fba = active & ~sel1
            sel2 = jnp.zeros((S1,), bool).at[jnp.where(act2, idx2, S1)].set(True, mode="drop")
            fb2 = act1b & ~sel2
            fba = fba | jnp.zeros((R,), bool).at[jnp.where(fb2, idx1, R)].set(True, mode="drop")
            return fba, slot0 * 0 + 1

    def fb(tbl_in):
        fba, entry_p = fb_lanes()

        def fb_body(state):
            tbl, act, pidx, it, drops = state
            # W=4: a full-width W=16 window would gather 16R lanes per round
            tbl, act, pidx, nex = _window_round_mw(
                tbl, (words, left, right, cnt, act, pidx, slot0), tri,
                w0_full_range, cap, 4,
            )
            return tbl, act, pidx, it + 1, drops + nex

        tbl_out, rem, _, _, fdrops = jax.lax.while_loop(
            cond, fb_body, (tbl_in, fba, entry_p, zero_v, zero_v)
        )
        return tbl_out, jnp.sum(rem).astype(jnp.int32) + fdrops

    def nofb(tbl_in):
        return tbl_in, n_left2 * 0

    tbl, fb_left = jax.lax.cond(overflow, fb, nofb, tbl)

    dropped = jnp.sum(t_left).astype(jnp.int32) + w_drops + fb_left
    keys, counts, extc, claim = tbl
    return MWShardTable(
        keys=keys,
        counts=counts,
        extc=extc,
        claim=claim,
        num_dropped=table.num_dropped + dropped,
    )


@jax.jit
def insert_ctg_batch_mw(table: MWShardTable, words, left, right, depth, valid,
                        dmin_lut) -> MWShardTable:
    """Contig-kmer insertion pass for k > 32 — the multi-word port of
    shard_table.insert_ctg_batch (insert_supermer_from_ctg semantics,
    src/kcount/kcount_cpu.cpp:357-407; rules listed there).

    Within-batch reduction sorts lanes lexicographically over the W key words
    (lax.sort with num_keys=W); invalid lanes sort last as all-ones, which no
    valid key can collide with (the canonical form of the all-T k-mer is the
    all-A k-mer, so an all-ones canonical key never occurs — the same
    argument that makes all-ones a safe EMPTY sentinel)."""
    cap = table.capacity
    Wn, R = words.shape
    words = words.astype(U32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)
    depth = jnp.minimum(depth.astype(jnp.int32), st.UINT16_MAX)

    # ---- within-batch reduction by k-mer ---------------------------------
    masked = [jnp.where(valid, words[j], EMPTY) for j in range(Wn)]
    sorted_ops = jax.lax.sort(
        (*masked, left, right, depth, valid.astype(jnp.int32)), num_keys=Wn
    )
    sw = list(sorted_ops[:Wn])
    sl, sr, sd = sorted_ops[Wn], sorted_ops[Wn + 1], sorted_ops[Wn + 2]
    sv = sorted_ops[Wn + 3].astype(bool)
    neq = jnp.zeros((R - 1,), bool)
    for j in range(Wn):
        neq |= sw[j][1:] != sw[j][:-1]
    first = jnp.concatenate([jnp.ones((1,), bool), neq]) & sv
    idx = jnp.arange(R, dtype=jnp.int32)
    gsp = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
    gsp = jnp.where(sv, gsp, R)
    epack = sl * 4 + sr
    gmin_e = jnp.full((R,), 99, jnp.int32).at[gsp].min(epack, mode="drop")
    gmax_e = jnp.full((R,), -1, jnp.int32).at[gsp].max(epack, mode="drop")
    gmin_d = jnp.full((R,), st.UINT16_MAX + 1, jnp.int32).at[gsp].min(sd, mode="drop")
    conflict = gmin_e != gmax_e
    u_w = sw  # unique lanes' words (first positions)
    u_left = sl
    u_right = sr
    u_depth = jnp.where(conflict, 0, gmin_d)
    active = first

    # ---- apply unique records against the table --------------------------
    lane = idx
    slot = (slot_hash_mw(jnp.stack(u_w, axis=0)) % U32(cap)).astype(jnp.int32)
    zero_v = (slot[0] & 0).astype(jnp.int32)
    INVALID = Wn * cap
    tbl = (table.keys, table.counts, table.extc, table.claim)
    CTG_BIT = st.CTG_BIT

    tri = st._probe_tri(cap)
    home = slot
    def cond(state):
        _, active, _, it, _ = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        tbl, active, pidx, it, drops = state
        keys, counts, extc, claim = tbl
        # windowed target find over all Wn words (see st._window_round),
        # candidate-major FLAT planes (no [R, W] tile padding); st.CTG_W=4
        # because this loop runs at FULL batch width (wide-gather cost)
        slot_c = []
        ok_c = []
        for c in range(st.CTG_W):
            p = pidx + c
            okc = active & (p < MAX_PROBE)
            sc = (home + tri[jnp.clip(p, 0, MAX_PROBE - 1)]) % cap
            slot_c.append(jnp.where(okc, sc, 0))
            ok_c.append(okc)
        flatc = jnp.concatenate(slot_c)
        cw_f = [keys[j * cap + flatc] for j in range(Wn)]
        has = jnp.zeros((R,), bool)
        slot = jnp.zeros((R,), jnp.int32)
        tgt_p = pidx
        is_match = jnp.zeros((R,), bool)
        is_empty = jnp.zeros((R,), bool)
        for c in range(st.CTG_W - 1, -1, -1):
            m = ok_c[c]
            e = ok_c[c]
            for j in range(Wn):
                cw = cw_f[j][c * R:(c + 1) * R]
                m = m & (cw == u_w[j])
                e = e & (cw == EMPTY)
            intr = m | e
            has = has | intr
            slot = jnp.where(intr, slot_c[c], slot)
            tgt_p = jnp.where(intr, pidx + c, tgt_p)
            is_match = jnp.where(intr, m, is_match)
            is_empty = jnp.where(intr, e, is_empty)
        gslot = jnp.where(has, slot, 0)
        # claim election at empty targets (within-batch keys unique; losers
        # of cross-key contention retry from the same probe index)
        cslot = jnp.where(is_empty, slot, cap)
        claim = claim.at[cslot].set(lane, mode="drop")
        won = is_empty & (claim[gslot] == lane)
        claim = claim.at[cslot].set(-1, mode="drop")
        w_slot = jnp.where(won, slot, INVALID)
        for j in range(Wn):
            keys = keys.at[j * cap + w_slot].set(u_w[j], mode="drop")

        # decision for matches (read-entry counts derive from the five left
        # buckets; ctg entries carry their depth in the counts word)
        cur = counts[gslot]
        cur_ctg = (cur & CTG_BIT) != 0
        # per-bucket flat gathers from the bucket-major extc ([R, 9] / [9, R]
        # stacks pad a tiny dim to the TPU tile)
        ext_raw = [extc[b * cap + gslot] for b in range(9)]
        # keep int32: under x64 jnp.sum promotes, and an int64 new_cnt would
        # hit the deprecated unsafe-cast scatter into the int32 counts array
        derived = (
            ext_raw[0] + ext_raw[1] + ext_raw[2] + ext_raw[3] + ext_raw[8]
        ).astype(jnp.int32)
        cur_cnt = jnp.minimum(
            jnp.where(cur_ctg, cur & (CTG_BIT - 1), derived), st.UINT16_MAX
        )
        ext_rows = [jnp.minimum(e, st.UINT16_MAX) for e in ext_raw]
        dmin = dmin_lut[jnp.clip(cur_cnt, 0, st.UINT16_MAX)]
        cl = st._call_ext(ext_rows[:4], dmin)
        cr = st._call_ext(ext_rows[4:8], dmin)
        non_uu = (cl >= 4) | (cr >= 4)
        ow_read = is_match & ~cur_ctg & ((cur_cnt == 1) | non_uu)
        live_ctg = is_match & cur_ctg & (cur_cnt != 0)
        agree = (cl == u_left) & (cr == u_right)
        ctg_depth = jnp.where(agree, jnp.minimum(u_depth, cur_cnt), 0)
        write = won | ow_read | live_ctg
        new_cnt = jnp.where(live_ctg, ctg_depth, u_depth)
        wr_slot = jnp.where(write, slot, cap)
        counts = counts.at[wr_slot].set(new_cnt | CTG_BIT, mode="drop")
        idx9 = (
            jnp.arange(9, dtype=jnp.int32)[:, None] * cap
            + jnp.where(write, slot, cap * 9)[None, :]
        )
        extc = extc.at[idx9].set(jnp.zeros((9, R), jnp.int32), mode="drop")
        lidx = jnp.where(
            write, jnp.where(u_left < 4, u_left, 8) * cap + slot, cap * 9
        )
        ridx = jnp.where(
            write & (u_right < 4), (4 + u_right) * cap + slot, cap * 9
        )
        extc = extc.at[lidx].set(new_cnt, mode="drop")
        extc = extc.at[ridx].set(new_cnt, mode="drop")

        resolved = is_match | won
        active = active & ~resolved
        pidx = jnp.where(has, tgt_p, pidx + st.CTG_W)
        drops = drops + jnp.sum(active & (pidx >= MAX_PROBE)).astype(jnp.int32)
        active = active & (pidx < MAX_PROBE)
        return (keys, counts, extc, claim), active, pidx, it + 1, drops

    tbl, left_over, _, _, w_drops = jax.lax.while_loop(
        cond, body, (tbl, active, slot * 0, zero_v, zero_v)
    )
    keys, counts, extc, claim = tbl
    dropped = jnp.sum(left_over).astype(jnp.int32) + w_drops
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
    keys2d = table.keys.reshape(table.n_words, -1)  # once per k-round: fine
    occupied = ~jnp.all(keys2d == EMPTY, axis=0)
    cap = table.counts.shape[0]
    # flat per-bucket slices of the bucket-major extc (no [*, 9] tile padding)
    ext_raw = [table.extc[b * cap:(b + 1) * cap] for b in range(9)]
    # read-entry counts derive from the five left buckets; ctg-pass entries
    # (insert_ctg_batch_mw) carry their depth in the counts word
    derived = (
        ext_raw[0] + ext_raw[1] + ext_raw[2] + ext_raw[3] + ext_raw[8]
    ).astype(jnp.int32)
    is_ctg = (table.counts & st.CTG_BIT) != 0
    counts = jnp.minimum(
        jnp.where(is_ctg, table.counts & (st.CTG_BIT - 1), derived),
        st.UINT16_MAX,
    )
    extc = [jnp.minimum(e, st.UINT16_MAX) for e in ext_raw]
    dmin = dmin_lut[jnp.clip(counts, 0, st.UINT16_MAX)]
    left = st._call_ext(extc[:4], dmin)
    right = st._call_ext(extc[4:8], dmin)
    keep = occupied & (counts >= 2) & (left < 4) & (right < 4)
    num_kept = jnp.sum(keep).astype(jnp.int64)
    sum_counts = jnp.sum(jnp.where(keep, counts, 0)).astype(jnp.int64)
    num_purged = jnp.sum(occupied).astype(jnp.int64) - num_kept
    return FinalizedMW(
        keys=jnp.where(keep[None, :], keys2d, EMPTY),
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


def compact_fin_mw(fin: FinalizedMW, K: int) -> FinalizedMW:
    """Multi-word port of shard_table.compact_fin (see there)."""
    cap = fin.keep.shape[0]
    slot = jnp.arange(cap, dtype=jnp.int32)
    idx = jax.lax.sort(jnp.where(fin.keep, slot, cap))[:K]
    act = jnp.arange(K, dtype=jnp.int32) < jnp.sum(fin.keep).astype(jnp.int32)
    g = jnp.clip(idx, 0, cap - 1)
    # per-word 1-D gathers (a [W, K] axis-1 gather lowers to the slow
    # batched path on this TPU stack — see _probe_round_mw)
    gathered = jnp.stack([fin.keys[j][g] for j in range(fin.keys.shape[0])], axis=0)
    return FinalizedMW(
        keys=jnp.where(act[None, :], gathered, EMPTY),
        counts=jnp.where(act, fin.counts[g], 0),
        left_ext=jnp.where(act, fin.left_ext[g], 0),
        right_ext=jnp.where(act, fin.right_ext[g], 0),
        keep=act,
        num_kept=fin.num_kept,
        sum_counts=fin.sum_counts,
        num_purged=fin.num_purged,
    )


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
