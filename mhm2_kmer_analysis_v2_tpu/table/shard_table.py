"""Shard-local k-mer hash table, HBM-resident, batch-vectorized, uint32 SoA.

TPU-native answer to the reference's two hash-table designs:
  - CPU: linear-probe open addressing with per-kmer scalar inserts
    (src/kcount/kcount_cpu.cpp:205-295)
  - GPU: CAS/quadratic-probe per-thread inserts
    (src/kcount/kcount-gpu/gpu_hash_table.cpp:357-424)

Neither maps to a vector machine.  Instead every record lane probes in
lockstep *vectorized sweeps*, with a claim-free two-phase key write standing
in for the GPU kernel's KEY_TRANSITION CAS protocol
(gpu_hash_table.cpp:368-396):

  per sweep: gather each active lane's slot key ->
    match        -> scatter-add the lane's extension contributions
                    (duplicate-index scatter-add accumulates, so duplicate
                    k-mers in a batch need no pre-aggregation)
    empty        -> all lanes scatter their lo key half; the re-gather names
                    each slot's winner, winners scatter hi (see _probe_round
                    for why slots can never hold a mixed pair); lanes whose
                    key is then present commit in the same sweep
    else         -> advance along the probe schedule (quadratic/triangular
                    like the reference GPU kernel for large tables, linear
                    for tiny ones — see _advance; cap 100 like
                    KCOUNT_HT_MAX_PROBE, CMakeDefinitions.txt:67)

  The `claim` scratch buffer is only used by the ctg-kmer pass and the
  singleton filter, which need one-winner-per-entry lane election.

Layout (SoA, per shard, all 32-bit — no u64 on device):
  keys_hi/keys_lo: [cap] uint32, EMPTY = all-ones pair (the reference's 0xFF..
      sentinel, src/kcount/kcount_cpu.cpp:217)
  counts: [cap] int32 — written ONLY by the contig-kmer pass (CTG_BIT flag +
      overwrite depth); read-path counts are DERIVED at finalize as the sum
      of the five left-extension buckets (below), which removes one
      full-width scatter-add per probe sweep from the hot path.  Saturation
      to uint16 max happens at finalize; per-add saturation with positive
      increments == final min, matching inc_with_limit at
      src/kcount/kcount_cpu.cpp:152-155.
  extc:  [9*cap] int32 flat, BUCKET-MAJOR (index = bucket*cap + slot) — any
         [*, 9] view would pad the minor dim to the TPU's 128-lane tile (a
         14x memory blowup: a 117M-slot shard's [cap, 9] reshape allocated
         59.9 GB); bucket = (left A,C,G,T = 0-3 | right = 4-7 |
      8 = left-invalid).  Every committed record lands in exactly one of
      buckets {0-3, 8}, so sum(buckets 0-3) + bucket 8 == the k-mer's count.
  claim: [cap] int32 scratch, -1 between batches

Capacity uses a nearest prime like the reference's prime tables
(src/kcount/prime.hpp) at target load factor 0.66 (kcount_cpu.cpp:442).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmer_ops import slot_hash

U32 = jnp.uint32
EMPTY = np.uint32(0xFFFFFFFF)  # np scalar: no device materialization at import
MAX_PROBE = 100  # KCOUNT_HT_MAX_PROBE, CMakeDefinitions.txt:67
UINT16_MAX = 65535
TARGET_LOAD_FACTOR = 0.66  # src/kcount/kcount_cpu.cpp:442
# Quadratic (triangular) probing, like the reference GPU insert kernel
# (gpu_hash_table.cpp:357-424): slot_i = home + i(i+1)/2 mod cap.  It kills
# the primary clustering that makes linear max-probe chains long at load —
# and the vectorized insert pays per WHILE-ITERATION (one full table-op
# sweep each), so the max chain over the batch is the cost.  The offsets
# T_0..T_99 are pairwise distinct mod cap iff cap > T_99 = 4950 (their
# differences are < 4951), so small tables keep the linear schedule.
QUAD_MIN_CAP = 4951
# Occupancy fraction past which the pipeline switches insert_batch to the
# loaded-tier (high_load=True) program: the cheap cascade's R/8 tier
# overflows at ~this load, sending every batch through the full-width
# fallback (scripts/exp_gap.py; pipeline/analysis.py occupancy poll).
HIGH_LOAD_SWITCH = 0.15


def _advance(slot, active, step, cap: int):
    """Next probe slot for active lanes.  ``step`` is the triangular
    increment for the probe just executed (probe index + 1); ignored on the
    linear schedule (cap < QUAD_MIN_CAP).  Placement is unobservable in the
    output contract (dump re-sorts by k-mer value), so the schedule is free
    to differ from the reference CPU table's linear probing."""
    inc = step if cap >= QUAD_MIN_CAP else 1
    nxt = slot + inc
    nxt = jnp.where(nxt >= cap, nxt - cap, nxt)  # inc <= MAX_PROBE < cap
    return jnp.where(active, nxt, slot)


def next_prime(n: int) -> int:
    """Smallest prime >= n (replaces the reference's precomputed prime tables,
    src/kcount/prime.hpp:854-893)."""
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

    keys_hi: jax.Array  # [cap] uint32
    keys_lo: jax.Array  # [cap] uint32
    counts: jax.Array  # [cap] int32 (ctg-pass only; read counts derived)
    extc: jax.Array  # [cap*9] int32
    claim: jax.Array  # [cap] int32 scratch (-1)
    num_dropped: jax.Array  # [] int32 (records past probe cap)

    @property
    def capacity(self) -> int:
        return self.keys_hi.shape[0]


def create(max_elems: int, load_factor: float = TARGET_LOAD_FACTOR) -> ShardTable:
    cap = next_prime(max(int(max_elems / load_factor), 11))
    return ShardTable(
        keys_hi=jnp.full((cap,), EMPTY, dtype=U32),
        keys_lo=jnp.full((cap,), EMPTY, dtype=U32),
        counts=jnp.zeros((cap,), jnp.int32),
        extc=jnp.zeros((cap * 9,), jnp.int32),
        claim=jnp.full((cap,), -1, jnp.int32),
        num_dropped=jnp.zeros((), jnp.int32),
    )


def probe_stats(table: ShardTable) -> dict:
    """Final-contents probe statistics — the load-factor / probe-length
    report of HashTableInserter::flush_inserts (kcount_cpu.cpp:496-521),
    derived from slot displacement (no per-insert state needed): each
    occupied slot's probe length is recovered from its displacement from the
    key's home slot (triangular offsets on the quadratic schedule)."""
    cap = table.capacity
    hi = np.asarray(table.keys_hi)
    lo = np.asarray(table.keys_lo)
    occ = (hi != 0xFFFFFFFF) | (lo != 0xFFFFFFFF)
    n = int(occ.sum())
    if n == 0:
        return {"occupied": 0, "load_factor": 0.0, "avg_probe": 0.0, "max_probe": 0}
    import jax.numpy as _jnp

    home = np.asarray(
        slot_hash(_jnp.asarray(hi[occ]), _jnp.asarray(lo[occ])) % U32(cap)
    ).astype(np.int64)
    slot = np.nonzero(occ)[0].astype(np.int64)
    dist = _displacement_to_probe(((slot - home) % cap), cap) + 1  # 1-based
    return {
        "occupied": n,
        "load_factor": n / cap,
        "avg_probe": float(dist.mean()),
        "max_probe": int(dist.max()),
    }


def _probe_tri_tables(cap: int):
    """(sorted triangular offsets, probe-index order) as device constants —
    the schedule inversion tables shared by the device probe-stat reducers."""
    if cap < QUAD_MIN_CAP:
        order = np.arange(MAX_PROBE, dtype=np.int64)
        tri_sorted = order.copy()
    else:
        i = np.arange(MAX_PROBE, dtype=np.int64)
        tri = (i * (i + 1) // 2) % cap
        order = np.argsort(tri)
        tri_sorted = tri[order]
    return (
        jnp.asarray(tri_sorted.astype(np.int32)),
        jnp.asarray(order.astype(np.int32)),
    )


@functools.lru_cache(maxsize=None)
def _probe_scalars_fn(cap: int):
    """Jitted per-shard probe stats from final contents — DEVICE-side (a few
    scalars per shard D2H, never the keys).  The always-on replacement for
    the host probe_stats pull (reference reports load factor / probe lengths
    for every run, kcount_cpu.cpp:496-521)."""
    ts, od = _probe_tri_tables(cap)

    @jax.jit
    def f(hi, lo):
        occ = (hi != EMPTY) | (lo != EMPTY)
        slot = jax.lax.broadcasted_iota(jnp.int32, hi.shape, hi.ndim - 1)
        home = (slot_hash(hi, lo) % U32(cap)).astype(jnp.int32)
        disp = jnp.mod(slot - home, cap)
        pos = jnp.clip(jnp.searchsorted(ts, disp.reshape(-1)), 0, MAX_PROBE - 1)
        probe = jnp.where(
            ts[pos] == disp.reshape(-1), od[pos], MAX_PROBE
        ).reshape(disp.shape) + 1
        probe = jnp.where(occ, probe, 0)
        return (
            jnp.sum(occ, axis=-1).astype(jnp.int64),
            jnp.sum(probe, axis=-1).astype(jnp.int64),
            jnp.max(probe, axis=-1).astype(jnp.int32),
        )

    return f


def probe_stats_device(keys_hi, keys_lo) -> dict:
    """Probe/load stats for a sharded table's [n_shards, cap] key planes,
    computed on device (multi-process safe: fetch pulls [n_shards] scalars).

    Returns {'occupied': [S], 'load_factor': [S], 'avg_probe': [S],
    'max_probe': [S]} numpy arrays."""
    from ..parallel import distributed as dist

    cap = keys_hi.shape[-1]
    n, sump, maxp = _probe_scalars_fn(cap)(keys_hi, keys_lo)
    n = dist.fetch(n).astype(np.int64)
    sump = dist.fetch(sump).astype(np.int64)
    maxp = dist.fetch(maxp).astype(np.int64)
    return {
        "occupied": n,
        "load_factor": n / cap,
        "avg_probe": np.where(n > 0, sump / np.maximum(n, 1), 0.0),
        "max_probe": maxp,
    }


def _displacement_to_probe(disp: np.ndarray, cap: int) -> np.ndarray:
    """Invert the probe schedule: displacement (slot - home) mod cap -> probe
    index.  Linear schedule: identity.  Quadratic: match against the
    triangular offsets (distinct mod cap by the QUAD_MIN_CAP bound)."""
    if cap < QUAD_MIN_CAP:
        return disp
    i = np.arange(MAX_PROBE, dtype=np.int64)
    tri = (i * (i + 1) // 2) % cap
    order = np.argsort(tri)
    pos = np.clip(np.searchsorted(tri[order], disp), 0, MAX_PROBE - 1)
    return np.where(tri[order][pos] == disp, order[pos], MAX_PROBE)


def _probe_round(tbl, recs, full_hi_range: bool = False, step=1):
    """One synchronized probe sweep over all active lanes.

    tbl = (keys_hi, keys_lo, counts, extc, claim);
    recs = (hi, lo, left, right, cnt, lane, active, slot).
    Returns (tbl', active', slot').

    Measured-cost design (the emulated-TPU unit costs are ~15-25 ms per
    1.2M-element random gather/scatter while fused elementwise is ~1 ms, so
    the round is organized to MINIMIZE table gathers/scatters):
      * emptiness is decided from the keys_hi gather alone — a stored hi can
        never equal the EMPTY sentinel for k <= 31 (hi has at most 2k-32 < 32
        significant bits).  `full_hi_range` (k == 32) adds the keys_lo check.
      * pre-existing matches are NOT detected up front; they fall out of the
        single post-write verification gather (which also confirms claim
        winners and lets same-key duplicates ride along) — saving one
        full-width gather pair per round.
      * the claim array is never reset: every lane that reads claim[slot]
        scattered to that slot in the same sweep, so stale values from
        earlier sweeps/batches are never observed.
    """
    keys_hi, keys_lo, counts, extc, claim = tbl
    hi, lo, left, right, cnt, lane, active, slot = recs
    cap = keys_hi.shape[0]
    gslot = jnp.where(active, slot, 0)
    thi = keys_hi[gslot]
    if full_hi_range:
        tlo0 = keys_lo[gslot]
        is_empty = active & (thi == EMPTY) & (tlo0 == EMPTY)
    else:
        is_empty = active & (thi == EMPTY)
    # claim-FREE two-phase key write (saves the claim scatter + gather of
    # the earlier protocol — 2 full-width table ops per sweep): all
    # empty-slot lanes scatter their lo half; the re-gather names the slot's
    # winner (duplicate-index scatter keeps exactly one update); only lanes
    # whose lo landed write hi.  A slot can never hold a mixed (hi, lo)
    # pair: hi writers agree with the landed lo, and ties on (slot, lo)
    # resolve to whichever hi lands — a consistent key either way.  Since
    # lo is always written together with hi (some lo winner always exists),
    # a slot is either fully EMPTY or a complete key between sweeps.
    e_slot = jnp.where(is_empty, slot, cap)
    keys_lo = keys_lo.at[e_slot].set(lo, mode="drop")
    tlo = keys_lo[gslot]
    won_lo = is_empty & (tlo == lo)
    w_slot = jnp.where(won_lo, slot, cap)
    keys_hi = keys_hi.at[w_slot].set(hi, mode="drop")
    # every lane whose key is now present commits (pre-existing matches,
    # winners, AND duplicate lanes of a winner's k-mer); tlo is current —
    # no lo write happened after its gather
    thi = keys_hi[gslot]
    commit = active & (thi == hi) & (tlo == lo)
    add_slot = jnp.where(commit, slot, cap)
    # extension tallies: ONE flat scatter-add over the concatenated left +
    # right bucket indices (table-op cost on the target chip is flat in lane
    # width, so one 2R-lane scatter beats two R-lane scatters).  A committed
    # lane always lands in one of the five left buckets (bucket 8 = invalid
    # left), so the count needs no scatter of its own — it is the sum of
    # those five buckets at finalize.  Invalid right ext contributes nothing.
    lidx = jnp.where(commit, jnp.where(left < 4, left, 8) * cap + add_slot, cap * 9)
    ridx = jnp.where(commit & (right < 4), (4 + right) * cap + add_slot, cap * 9)
    extc = extc.at[jnp.concatenate([lidx, ridx])].add(
        jnp.concatenate([cnt, cnt]), mode="drop"
    )
    active = active & ~commit
    slot = _advance(slot, active, step, cap)
    return (keys_hi, keys_lo, counts, extc, claim), active, slot


# used by the multi-word table's (simpler) insert structure
_FULL_ROUNDS = 1
_COMPACT_FRACTION = 8

# Windowed probing (the long-chain while_loop): candidates per round.  At
# high load the insert cost is the while_loop TRIP COUNT times ~7 table ops,
# and on the target chip a table op costs the same at any lane width
# (measured: a batch at 0.77 load ran 44x slower than at 0.20 — ~49 rounds x
# 7 ops x ~18 ms; scripts/exp_gap.py).  Gathering W candidate slots per lane
# in ONE flat gather covers W probe steps per round, cutting rounds ~W-fold
# for the same per-round op count.
PROBE_WINDOW = 16
# full-width windowed loops (ctg insert) keep W=4: see the CTG_W comment
CTG_W = 4


def _probe_tri(cap: int):
    """Probe-schedule offsets T_0..T_99 (triangular for quadratic caps,
    identity for the linear schedule) as a device constant."""
    i = np.arange(MAX_PROBE, dtype=np.int64)
    tri = (i * (i + 1) // 2) % cap if cap >= QUAD_MIN_CAP else i
    return jnp.asarray(tri.astype(np.int32))


def _window_round(tbl, recs, tri, full_hi_range: bool, W: int):
    """One windowed probe round over the active lanes.

    recs = (hi, lo, left, right, cnt, active, pidx, home); pidx is each
    lane's current probe INDEX (0 = home).  Gathers the W candidate slots at
    probe indices pidx..pidx+W-1 in one flat gather per key plane, jumps to
    the first match-or-empty candidate, and runs the claim-free two-phase
    write there (see _probe_round).  Correctness relies on the open-
    addressing invariant that slots only transition EMPTY -> occupied: a
    key's stored position always precedes any empty slot on its probe path,
    so committing at the FIRST interesting candidate can never insert a
    duplicate ahead of an existing entry.  All candidate gathers in a round
    read the pre-round snapshot; a slot seen empty is contested through the
    lo-write election exactly like the single-step protocol.

    Returns (tbl', active', pidx').  Lanes that lose a write election stay
    at the contested probe index (the slot is now occupied, so the next
    round's window moves past it); lanes with no interesting candidate
    advance by W; lanes past MAX_PROBE go inactive (caller counts them as
    dropped via its own bookkeeping of never-committed lanes).
    """
    keys_hi, keys_lo, counts, extc, claim = tbl
    hi, lo, left, right, cnt, active, pidx, home = recs
    cap = keys_hi.shape[0]
    R = hi.shape[0]
    # candidate-major FLAT planes: a [R, W] 2-D layout pads the minor dim to
    # the 128-lane tile (the documented [*, 9] extc trap — 8-32x wasted VPU
    # work, measured as the residual multi-second loaded-batch cost), so the
    # W candidates live as W separate [R] slices of one [W*R] gather
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
    # first match-or-empty candidate per lane: reverse priority select over
    # the W [R]-wide slices (lowest interesting c wins)
    has = jnp.zeros((R,), bool)
    tgt_slot = jnp.zeros((R,), jnp.int32)
    tgt_p = pidx
    tgt_empty = jnp.zeros((R,), bool)
    for c in range(W - 1, -1, -1):
        chi = chi_f[c * R:(c + 1) * R]
        clo = clo_f[c * R:(c + 1) * R]
        m = ok_c[c] & (chi == hi) & (clo == lo)
        if full_hi_range:
            e = ok_c[c] & (chi == EMPTY) & (clo == EMPTY)
        else:
            # k <= 31: a stored hi can never equal EMPTY
            e = ok_c[c] & (chi == EMPTY)
        intr = m | e
        has = has | intr
        tgt_slot = jnp.where(intr, slot_c[c], tgt_slot)
        tgt_p = jnp.where(intr, pidx + c, tgt_p)
        tgt_empty = jnp.where(intr, e, tgt_empty)
    # two-phase write at the target slot (empty targets only; match targets
    # ride the verify gather straight to commit)
    e_slot = jnp.where(tgt_empty, tgt_slot, cap)
    keys_lo = keys_lo.at[e_slot].set(lo, mode="drop")
    gslot = jnp.where(has, tgt_slot, 0)
    tlo = keys_lo[gslot]
    won_lo = tgt_empty & (tlo == lo)
    w_slot = jnp.where(won_lo, tgt_slot, cap)
    keys_hi = keys_hi.at[w_slot].set(hi, mode="drop")
    thi = keys_hi[gslot]
    commit = has & (thi == hi) & (tlo == lo)
    add_slot = jnp.where(commit, tgt_slot, cap)
    lidx = jnp.where(commit, jnp.where(left < 4, left, 8) * cap + add_slot, cap * 9)
    ridx = jnp.where(commit & (right < 4), (4 + right) * cap + add_slot, cap * 9)
    extc = extc.at[jnp.concatenate([lidx, ridx])].add(
        jnp.concatenate([cnt, cnt]), mode="drop"
    )
    pidx = jnp.where(has, tgt_p, pidx + W)
    survive = active & ~commit
    active = survive & (pidx < MAX_PROBE)
    # lanes whose whole schedule is exhausted without a commit are the
    # reference's dropped-kmer case (probe cap KCOUNT_HT_MAX_PROBE)
    n_exhausted = jnp.sum(survive & (pidx >= MAX_PROBE)).astype(jnp.int32)
    return (keys_hi, keys_lo, counts, extc, claim), active, pidx, n_exhausted


def _compact_sort(arrs, active, S):
    """Pack the active lanes' records into S slots (order-preserving).

    Sort-based (a single lax.sort of lane keys) instead of jnp.nonzero: the
    sort compiles inside lax.scan on this backend where nonzero's big
    cumsum reduce-window blows the scoped-VMEM limit, and costs about the
    same (~10 ms / 1.2M lanes).
    """
    n = active.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    idx = jax.lax.sort(jnp.where(active, lane, n))[:S]
    n_left = jnp.sum(active).astype(jnp.int32)
    rank = jnp.arange(S, dtype=jnp.int32)
    act = rank < jnp.minimum(n_left, S)
    gidx = jnp.clip(idx, 0, n - 1)
    return [a[gidx] for a in arrs], act, rank, idx, n_left


@functools.partial(jax.jit, static_argnames=("full_hi_range", "high_load"))
def insert_batch(table: ShardTable, hi, lo, left, right, cnt, valid,
                 full_hi_range: bool = True, high_load: bool = False) -> ShardTable:
    """Insert one batch of canonical k-mer records into the table.

    hi/lo: [R] uint32 canonical k-mer pairs; left/right: [R] int32 ext codes
    (>=4 contributes nothing); cnt: [R] int32; valid: [R] bool.
    full_hi_range=False (safe only for k <= 31) enables the single-gather
    emptiness probe (see _probe_round).

    Cost model: one full-width sweep resolves almost every lane at LOW load;
    leftovers (hash collisions at loaded slots) are compacted for narrower
    follow-up rounds — a compaction CASCADE (the reference GPU kernel gets
    this for free from per-thread loops, gpu_hash_table.cpp:357-424; a
    lockstep vector machine has to compact).  Two statically-compiled tier
    layouts (both bit-identical in effect — placement is unobservable):

      high_load=False  sweep1 -> R/8 single-step sweep -> R/64 windowed
                       while (the cheap path while survivors fit R/8,
                       i.e. table load under ~0.2)
      high_load=True   ONE windowed W=4 round from probe 0 at FULL width
                       (covers probes 0-3) -> R/4 windowed W=16 while.
                       Survivors after 4 probes at load alpha are ~alpha^4
                       (+ election losers): under R/4 up to ~0.70 load.
                       The earlier layout (sweep1 -> R/2 compact -> W=4)
                       overflowed into the full-width fallback on EVERY
                       batch past ~0.5 load — sweep-1 survivors are ~alpha*R
                       (home slot held by a different key), measured as the
                       3.3 s/batch collapse at 0.61 load on a 117M-slot
                       table; this layout measures 0.94 s/batch there
                       (3.5x, BASELINE.md round 5).

    Window width is bounded by the superlinear cost of very wide flat
    gathers on the target chip (a full-width W=8 window gathers 8R ~ 9.8M
    lanes and measured 3x the W=4 program despite halving the probe rounds
    — BASELINE.md round 5), so windows are sized to keep every flat gather
    at or under ~4R lanes: W=4 at full width, W=16 only on the R/4
    compacted tier, and W=4 in the lossless full-width overflow fallback.
    Callers flip high_load from a cheap occupancy poll (the pipeline
    switches at HIGH_LOAD_SWITCH load); a wrong flag costs speed, never
    correctness.
    """
    cap = table.capacity
    R = hi.shape[0]
    hi = hi.astype(U32)
    lo = lo.astype(U32)
    lane = jnp.arange(R, dtype=jnp.int32)
    cnt = cnt.astype(jnp.int32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)

    slot0 = (slot_hash(hi, lo) % U32(cap)).astype(jnp.int32)
    active = valid

    tbl = (table.keys_hi, table.keys_lo, table.counts, table.extc, table.claim)
    tri = _probe_tri(cap)
    zero_v = (slot0[0] & 0).astype(jnp.int32)

    if high_load:
        # ONE full-width W=4 windowed round from probe 0 (see docstring),
        # with a packed meta plane for the single compaction that follows
        tbl, act0, p0, d1 = _window_round(
            tbl, (hi, lo, left, right, cnt, active, slot0 * 0, slot0), tri,
            full_hi_range, 4,
        )
        S2 = min(max(R // 4, 4096), R)
        meta = (left | (right << 3) | (jnp.minimum(cnt, 0xFFFF) << 6))
        (t_hi, t_lo, t_m, t_h0, t_p), act2, rank2, idx2, n_left2 = _compact_sort(
            [hi, lo, meta, slot0, p0], act0, S2
        )
        t_l, t_r, t_c = t_m & 7, (t_m >> 3) & 7, t_m >> 6
        entr_p = t_p
        pre_drops = d1
    else:
        tbl, active, slot = _probe_round(
            tbl, (hi, lo, left, right, cnt, lane, active, slot0),
            full_hi_range, step=1
        )
        # tier-1 compaction + one single-step sweep (slot0 rides along: the
        # windowed tier-2 probes from each lane's HOME slot + probe index)
        S1 = min(max(R // 8, 4096), R)
        (s_hi, s_lo, s_l, s_r, s_c, s_sl, s_h0), act1, rank1, idx1, n_left1 = _compact_sort(
            [hi, lo, left, right, cnt, slot, slot0], active, S1
        )
        tbl, act1b, s_sl = _probe_round(
            tbl, (s_hi, s_lo, s_l, s_r, s_c, rank1, act1, s_sl), full_hi_range, step=2
        )
        S2 = min(max(R // 64, 1024), S1)
        (t_hi, t_lo, t_l, t_r, t_c, t_h0), act2, rank2, idx2, n_left2 = _compact_sort(
            [s_hi, s_lo, s_l, s_r, s_c, s_h0], act1b, S2
        )
        # entrants sit at probe index 2 (advanced by sweeps 1 and 2);
        # derived from traced data so the carry's varying-axis annotation
        # matches the body outputs under shard_map
        entr_p = t_h0 * 0 + 2
        pre_drops = zero_v

    def cond(state):
        return jnp.any(state[1]) & (state[3] < MAX_PROBE)

    def body(state):
        tbl, act, pidx, it, drops = state
        tbl, act, pidx, nex = _window_round(
            tbl, (t_hi, t_lo, t_l, t_r, t_c, act, pidx, t_h0), tri,
            full_hi_range, PROBE_WINDOW,
        )
        return tbl, act, pidx, it + 1, drops + nex

    tbl, t_left, _, _, w_drops = jax.lax.while_loop(
        cond, body, (tbl, act2, entr_p, zero_v, pre_drops)
    )

    # lanes that overflowed a compaction tier rewalk at full width —
    # lossless, and free (lax.cond) when no overflow occurred.  Restart is
    # safe: re-probing an already-committed key cannot re-commit because
    # those lanes are not in the fallback set.  Entry probe index must never
    # SKIP ahead of a lane's last examined probe (an election loser at probe
    # p has unexamined — possibly empty — slots at p+1.., and claiming a
    # later slot while an earlier one is empty breaks the lookup invariant):
    # the high_load path re-enters at each lane's CARRIED index from the W=4
    # round; the low-load path rewalks from probe 1 (re-examining occupied
    # slots is harmless).  W=4: a full-width W=16 window would gather 16R
    # lanes per round.
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
            tbl, act, pidx, nex = _window_round(
                tbl, (hi, lo, left, right, cnt, act, pidx, slot0), tri,
                full_hi_range, 4,
            )
            return tbl, act, pidx, it + 1, drops + nex

        tbl_out, rem, _, _, fdrops = jax.lax.while_loop(
            cond, fb_body, (tbl_in, fba, entry_p, zero_v, zero_v),
        )
        return tbl_out, jnp.sum(rem).astype(jnp.int32) + fdrops

    def nofb(tbl_in):
        # zero derived from traced data so both cond branches have identical
        # types (incl. shard_map varying-axis annotations)
        return tbl_in, n_left2 * 0

    tbl, fb_left = jax.lax.cond(overflow, fb, nofb, tbl)

    # only probe-cap exhaustion remains (the reference's dropped-kmer case)
    dropped = jnp.sum(t_left).astype(jnp.int32) + w_drops + fb_left
    keys_hi, keys_lo, counts, extc, claim = tbl
    return ShardTable(
        keys_hi=keys_hi,
        keys_lo=keys_lo,
        counts=counts,
        extc=extc,
        claim=claim,
        num_dropped=table.num_dropped + dropped,
    )


CTG_BIT = np.int32(1 << 30)  # from_ctg flag in the counts word


@jax.jit
def insert_ctg_batch(table: ShardTable, hi, lo, left, right, depth, valid, dmin_lut) -> ShardTable:
    """Contig-kmer insertion pass — insert_supermer_from_ctg semantics
    (src/kcount/kcount_cpu.cpp:357-407), run AFTER the read pass of a round:

      new k-mer            -> insert {count=depth, from_ctg, exts=depth@L/R}
      read entry, count==1 -> overwrite (singleton)
      read entry, non-UU   -> overwrite (called ext X/F on either side)
      read entry, UU       -> keep
      ctg entry, count!=0  -> exts agree: count=min(depth, count);
                              exts differ: count=0 (purged at finalize)

    Batch pre-reduction replaces the sequential scan: per unique k-mer the
    depth is the min over occurrences and any extension disagreement yields
    the 0-purge marker — provably the same outcome as the reference's
    occurrence-by-occurrence loop.  The CPU backend's singleton-override
    eviction under memory pressure (kcount_cpu.cpp:249-265) is not carried:
    probe-cap overflow counts as dropped instead.
    """
    cap = table.capacity
    R = hi.shape[0]
    hi = hi.astype(U32)
    lo = lo.astype(U32)
    left = left.astype(jnp.int32)
    right = right.astype(jnp.int32)
    depth = jnp.minimum(depth.astype(jnp.int32), UINT16_MAX)

    # ---- within-batch reduction by k-mer ---------------------------------
    key64 = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    key64 = jnp.where(valid, key64, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    order = jnp.argsort(key64)
    sk = key64[order]
    sv = valid[order]
    sl, sr, sd = left[order], right[order], depth[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]]) & sv
    idx = jnp.arange(R, dtype=jnp.int32)
    gsp = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
    gsp = jnp.where(sv, gsp, R)
    epack = sl * 4 + sr
    gmin_e = jnp.full((R,), 99, jnp.int32).at[gsp].min(epack, mode="drop")
    gmax_e = jnp.full((R,), -1, jnp.int32).at[gsp].max(epack, mode="drop")
    gmin_d = jnp.full((R,), UINT16_MAX + 1, jnp.int32).at[gsp].min(sd, mode="drop")
    conflict = gmin_e != gmax_e
    u_hi = (sk >> jnp.uint64(32)).astype(U32)
    u_lo = (sk & jnp.uint64(0xFFFFFFFF)).astype(U32)
    u_left = sl
    u_right = sr
    u_depth = jnp.where(conflict, 0, gmin_d)
    active = first

    # ---- apply unique records against the table --------------------------
    lane = idx
    slot = (slot_hash(u_hi, u_lo) % U32(cap)).astype(jnp.int32)
    zero_v = (slot[0] & 0).astype(jnp.int32)
    tbl = (table.keys_hi, table.keys_lo, table.counts, table.extc, table.claim)

    tri = _probe_tri(cap)
    home = slot
    def cond(state):
        _, active, _, it, _ = state
        return jnp.any(active) & (it < MAX_PROBE)

    def body(state):
        tbl, active, pidx, it, drops = state
        keys_hi, keys_lo, counts, extc, claim = tbl
        # windowed target find (see _window_round): first match-or-empty
        # candidate among the next CTG_W probe positions, candidate-major
        # FLAT planes (a [R, W] layout pads the minor dim to the tile).
        # CTG_W=4, NOT PROBE_WINDOW=16: this loop runs at FULL batch width
        # and 16R-lane flat gathers are superlinear on the target chip
        # (BASELINE.md round 5); W=16 stays correct only on compacted tiers.
        slot_c = []
        ok_c = []
        for c in range(CTG_W):
            p = pidx + c
            okc = active & (p < MAX_PROBE)
            sc = (home + tri[jnp.clip(p, 0, MAX_PROBE - 1)]) % cap
            slot_c.append(jnp.where(okc, sc, 0))
            ok_c.append(okc)
        flatc = jnp.concatenate(slot_c)
        chi_f = keys_hi[flatc]
        clo_f = keys_lo[flatc]
        has = jnp.zeros((R,), bool)
        slot = jnp.zeros((R,), jnp.int32)
        tgt_p = pidx
        is_match = jnp.zeros((R,), bool)
        is_empty = jnp.zeros((R,), bool)
        for c in range(CTG_W - 1, -1, -1):
            chi = chi_f[c * R:(c + 1) * R]
            clo = clo_f[c * R:(c + 1) * R]
            m = ok_c[c] & (chi == u_hi) & (clo == u_lo)
            e = ok_c[c] & (chi == EMPTY) & (clo == EMPTY)
            intr = m | e
            has = has | intr
            slot = jnp.where(intr, slot_c[c], slot)
            tgt_p = jnp.where(intr, pidx + c, tgt_p)
            is_match = jnp.where(intr, m, is_match)
            is_empty = jnp.where(intr, e, is_empty)
        gslot = jnp.where(has, slot, 0)
        # claim election at empty targets (within-batch keys are unique, but
        # DIFFERENT keys can target one slot; losers retry from the same
        # probe index — the slot is occupied next round, so they move on)
        cslot = jnp.where(is_empty, slot, cap)
        claim = claim.at[cslot].set(lane, mode="drop")
        won = is_empty & (claim[gslot] == lane)
        claim = claim.at[cslot].set(-1, mode="drop")
        wslot = jnp.where(won, slot, cap)
        keys_hi = keys_hi.at[wslot].set(u_hi, mode="drop")
        keys_lo = keys_lo.at[wslot].set(u_lo, mode="drop")

        # decision for matches (read-entry counts are derived from the five
        # left buckets; ctg entries carry their depth in the counts word)
        cur = counts[gslot]
        cur_ctg = (cur & CTG_BIT) != 0
        # per-bucket flat gathers from the bucket-major extc (9 flat [R]
        # gathers; a [R, 9] row gather would pad 9 -> 128 lanes on TPU)
        ext_raw = [extc[b * cap + gslot] for b in range(9)]
        # keep int32: under x64 jnp.sum promotes, and an int64 new_cnt would
        # hit the deprecated unsafe-cast scatter into the int32 counts array
        derived = (
            ext_raw[0] + ext_raw[1] + ext_raw[2] + ext_raw[3] + ext_raw[8]
        ).astype(jnp.int32)
        cur_cnt = jnp.minimum(
            jnp.where(cur_ctg, cur & (CTG_BIT - 1), derived), UINT16_MAX
        )
        ext_rows = [jnp.minimum(e, UINT16_MAX) for e in ext_raw]
        dmin = dmin_lut[jnp.clip(cur_cnt, 0, UINT16_MAX)]
        cl = _call_ext(ext_rows[:4], dmin)
        cr = _call_ext(ext_rows[4:8], dmin)
        non_uu = (cl >= 4) | (cr >= 4)
        # read entries: overwrite singletons and non-UU
        ow_read = is_match & ~cur_ctg & ((cur_cnt == 1) | non_uu)
        # ctg entries with count!=0: always overwrite; exts disagree -> 0
        live_ctg = is_match & cur_ctg & (cur_cnt != 0)
        agree = (cl == u_left) & (cr == u_right)
        ctg_depth = jnp.where(agree, jnp.minimum(u_depth, cur_cnt), 0)
        write = won | ow_read | live_ctg
        new_cnt = jnp.where(live_ctg, ctg_depth, u_depth)
        wr_slot = jnp.where(write, slot, cap)
        counts = counts.at[wr_slot].set(new_cnt | CTG_BIT, mode="drop")
        # reset the ext buckets then set the contributions; the left bucket
        # (bucket 8 for an invalid left) always gets new_cnt so the derived
        # count stays consistent for any later reader
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
        pidx = jnp.where(has, tgt_p, pidx + CTG_W)
        drops = drops + jnp.sum(active & (pidx >= MAX_PROBE)).astype(jnp.int32)
        active = active & (pidx < MAX_PROBE)
        return (keys_hi, keys_lo, counts, extc, claim), active, pidx, it + 1, drops

    tbl, left_over, _, _, w_drops = jax.lax.while_loop(
        cond, body, (tbl, active, slot * 0, zero_v, zero_v)
    )
    keys_hi, keys_lo, counts, extc, claim = tbl
    dropped = jnp.sum(left_over).astype(jnp.int32) + w_drops
    return ShardTable(
        keys_hi=keys_hi,
        keys_lo=keys_lo,
        counts=counts,
        extc=extc,
        claim=claim,
        num_dropped=table.num_dropped + dropped,
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

    keys_hi: jax.Array  # [cap] uint32 (EMPTY where purged)
    keys_lo: jax.Array
    counts: jax.Array  # [cap] int32 (uint16-saturated)
    left_ext: jax.Array  # [cap] int32 code 0-3=ACGT, 4='X', 5='F'
    right_ext: jax.Array
    keep: jax.Array  # [cap] bool
    num_kept: jax.Array  # [] int64
    sum_counts: jax.Array  # [] int64 ("Total kmer count sum")
    num_purged: jax.Array  # [] int64


EXT_X = 4
EXT_F = 5


def _call_ext(extc4: list, dmin: jax.Array) -> jax.Array:
    """Vectorized ExtCounts::get_ext (src/kcount/kcount_cpu.cpp:173-182).

    extc4: LIST of 4 flat [N] saturated count planes (one per base) — planes
    stay 1D because any stacked [N, 4] / [4, N] array pads a tiny dim to the
    TPU tile (128 lanes / 8 sublanes; the [cap, 9] form of a 117M-slot shard
    allocated 59.9 GB); dmin: [N] dynamic min depth.
    Sort order: count desc, ties by higher base char (T>G>C>A) — encoded as
    score = count*4 + base_code so the max reproduces the tie-break.
    """
    score = [extc4[b] * 4 + b for b in range(4)]
    top_score = jnp.maximum(
        jnp.maximum(score[0], score[1]), jnp.maximum(score[2], score[3])
    )
    top_base = (top_score % 4).astype(jnp.int32)
    top_cnt = top_score // 4
    masked = [jnp.where(s == top_score, -1, s) for s in score]
    runner = jnp.maximum(
        jnp.maximum(masked[0], masked[1]), jnp.maximum(masked[2], masked[3])
    )
    runner_cnt = jnp.maximum(runner, -1) // 4
    ext = jnp.where(
        top_cnt < dmin,
        EXT_X,
        jnp.where(runner_cnt >= dmin, EXT_F, top_base),
    )
    return ext.astype(jnp.int32)


@jax.jit
def _finalize_jit(table: ShardTable, dmin_lut: jax.Array) -> FinalizedShard:
    occupied = (table.keys_hi != EMPTY) | (table.keys_lo != EMPTY)
    cap = table.keys_hi.shape[0]
    # flat per-bucket slices of the bucket-major extc: table-sized planes
    # must stay 1D (see _call_ext docstring for the tile-padding trap)
    ext_raw = [table.extc[b * cap:(b + 1) * cap] for b in range(9)]
    # read-entry counts = sum of the five left buckets; ctg-pass overwrites
    # carry their depth in the counts word (CTG_BIT flag)
    derived = (
        ext_raw[0] + ext_raw[1] + ext_raw[2] + ext_raw[3] + ext_raw[8]
    ).astype(jnp.int32)
    is_ctg = (table.counts & CTG_BIT) != 0
    counts = jnp.minimum(
        jnp.where(is_ctg, table.counts & (CTG_BIT - 1), derived), UINT16_MAX
    )
    extc = [jnp.minimum(e, UINT16_MAX) for e in ext_raw]
    dmin = dmin_lut[jnp.clip(counts, 0, UINT16_MAX)]
    left = _call_ext(extc[:4], dmin)
    right = _call_ext(extc[4:8], dmin)
    # purge count<2 and X/F extensions (src/kcount/kcount_cpu.cpp:554-573)
    keep = occupied & (counts >= 2) & (left < 4) & (right < 4)
    num_kept = jnp.sum(keep).astype(jnp.int64)
    sum_counts = jnp.sum(jnp.where(keep, counts, 0)).astype(jnp.int64)
    num_purged = jnp.sum(occupied).astype(jnp.int64) - num_kept
    return FinalizedShard(
        keys_hi=jnp.where(keep, table.keys_hi, EMPTY),
        keys_lo=jnp.where(keep, table.keys_lo, EMPTY),
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


def compact_fin(fin: FinalizedShard, K: int) -> FinalizedShard:
    """Device-side compaction of a finalized shard to its first K kept
    entries — the bulk-D2H compact table of done_all_inserts
    (src/kcount/kcount-gpu/gpu_hash_table.cpp:736-784).  The host then pulls
    ~12 B per KEPT k-mer instead of ~21 B per slot of CAPACITY (measured
    31.6 s vs <1 s for a 1M-kmer / 13.8M-slot table through the 3 MB/s
    tunnel).  One index sort + K-lane gathers; order within the shard is by
    slot (consumers re-sort by k-mer value).  Call with K >= num_kept."""
    cap = fin.keep.shape[0]
    slot = jnp.arange(cap, dtype=jnp.int32)
    idx = jax.lax.sort(jnp.where(fin.keep, slot, cap))[:K]
    act = jnp.arange(K, dtype=jnp.int32) < jnp.sum(fin.keep).astype(jnp.int32)
    g = jnp.clip(idx, 0, cap - 1)
    return FinalizedShard(
        keys_hi=jnp.where(act, fin.keys_hi[g], EMPTY),
        keys_lo=jnp.where(act, fin.keys_lo[g], EMPTY),
        counts=jnp.where(act, fin.counts[g], 0),
        left_ext=jnp.where(act, fin.left_ext[g], 0),
        right_ext=jnp.where(act, fin.right_ext[g], 0),
        keep=act,
        num_kept=fin.num_kept,
        sum_counts=fin.sum_counts,
        num_purged=fin.num_purged,
    )


def num_elems(table: ShardTable) -> int:
    """Occupied-slot count (the reference tracks this per insert; we reduce on
    demand instead since duplicate lanes make incremental counting ambiguous)."""
    occ = (np.asarray(table.keys_hi) != 0xFFFFFFFF) | (
        np.asarray(table.keys_lo) != 0xFFFFFFFF
    )
    return int(occ.sum())


_EXT_CHARS = np.array(list("ACGTXF"))
_BASES = np.array(list("ACGT"))


def compact_to_host(fin: FinalizedShard):
    """Pull kept entries to host as (vals u64, counts, left chars, right
    chars), sorted by k-mer value."""
    keep = np.asarray(fin.keep)
    hi = np.asarray(fin.keys_hi)[keep].astype(np.uint64)
    lo = np.asarray(fin.keys_lo)[keep].astype(np.uint64)
    vals = (hi << np.uint64(32)) | lo
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
