"""Sharded k-mer counting step: shard_map + all_to_all owner routing.

This replaces the reference's entire communication backend for the hot path —
the ThreeTierAggrStore of aggregated UPC++ RPCs carrying Supermers to owner
ranks (src/kcount/kmer_dht.hpp:124, kmer_dht.cpp:144-151, 247-258) — with a
dense, fixed-capacity `jax.lax.all_to_all` exchange over the device mesh:

  1. every device extracts canonical k-mer records from its slice of the read
     batch (data parallelism over reads = the reference's per-rank FASTQ
     blocks, SURVEY §2.7),
  2. records are bucketed by owner shard (minimizer routing, selection
     identical to kmer_dht.cpp:193-196) into [n_shards, cap] padded buffers
     (the fixed-capacity analogue of --max-kmer-store),
  3. one all_to_all delivers every shard its records over ICI/DCN,
  4. each shard runs the vectorized insert (table/shard_table.py).

The three-tier (rank->node->network) aggregation is subsumed by XLA's
hierarchical all_to_all over ICI vs DCN.  The exchange is LOSSLESS under
arbitrary skew: when any destination has more records than `cap`, the step
runs additional spill rounds (one all_to_all each, uniform trip count via
pmax) until every queue drains — the collective-loop analogue of
ThreeTierAggrStore's backpressure (src/kcount/kmer_dht.cpp:247-258).
--max-rpcs-in-flight bounds the rounds; only then can records be dropped,
and they are counted in `overflow`.  With one shard the bucketing and
exchange are bypassed entirely.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kmer_ops import kmer_records
from ..table import shard_table
from ..table.shard_table import ShardTable
from . import exchange

U32 = jnp.uint32  # used by make_count_step_supermer's wire packing


def _memo(fn):
    """Memoize the make_* step factories on their (hashable) arguments.

    Each factory wraps fresh Python closures in jax.jit, so a second call
    with identical arguments would otherwise produce a NEW jitted function
    and recompile the identical program — measured ~28 s per remote compile
    on the tunneled chip.  Mesh objects hash by device layout + axis names,
    so equal meshes share cache entries across pipeline invocations."""
    cache = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        key = (args, tuple(sorted(kwargs.items())))
        if key not in cache:
            cache[key] = fn(*args, **kwargs)
        return cache[key]

    return wrapper


class ShardedState(NamedTuple):
    """Table state with a leading shard axis [n_shards, ...]."""

    keys_hi: jax.Array
    keys_lo: jax.Array
    counts: jax.Array
    extc: jax.Array
    claim: jax.Array
    num_dropped: jax.Array
    overflow: jax.Array  # records lost ONLY when --max-rpcs-in-flight caps rounds
    spill_rounds: jax.Array  # extra exchange rounds beyond the first (skew signal)


def _sharded_init(mesh: Mesh, spec_tree, build_fn):
    """jit the state constructor with sharded out_shardings: every device
    fills only ITS shard on-device.  (Building the replicated global on the
    host and device_put-ing it moved GBs through host memory — measured ~6
    minutes for a reference-scale table on the CPU mesh, and it would ride
    the slow h2d path on real chips.)"""
    shardings = jax.tree.map(
        lambda spec: jax.sharding.NamedSharding(mesh, spec), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.jit(build_fn, out_shardings=shardings)()


def create_sharded(n_shards: int, max_elems_per_shard: int, mesh: Mesh | None = None) -> ShardedState:
    def build():
        one = shard_table.create(max_elems_per_shard)

        def rep(x):
            return jnp.broadcast_to(x[None], (n_shards,) + x.shape)

        return ShardedState(
            keys_hi=rep(one.keys_hi),
            keys_lo=rep(one.keys_lo),
            counts=rep(one.counts),
            extc=rep(one.extc),
            claim=rep(one.claim),
            num_dropped=jnp.zeros((n_shards,), jnp.int32),
            overflow=jnp.zeros((n_shards,), jnp.int32),
            spill_rounds=jnp.zeros((n_shards,), jnp.int32),
        )

    if mesh is not None:
        return _sharded_init(mesh, _STATE_SPEC, build)
    return build()


_STATE_SPEC = ShardedState(
    keys_hi=P("sh", None),
    keys_lo=P("sh", None),
    counts=P("sh", None),
    extc=P("sh", None),
    claim=P("sh", None),
    num_dropped=P("sh"),
    overflow=P("sh"),
    spill_rounds=P("sh"),
)


def _local_table(state: ShardedState) -> ShardTable:
    return ShardTable(
        keys_hi=state.keys_hi[0],
        keys_lo=state.keys_lo[0],
        counts=state.counts[0],
        extc=state.extc[0],
        claim=state.claim[0],
        num_dropped=state.num_dropped[0],
    )


def _pack_meta(left, right, cnt, valid):
    """left(3b) | right(3b) << 3 | count(16b) << 6; 0 == empty slot (count>=1
    for real records so meta != 0 always holds for them)."""
    meta = (
        left.astype(jnp.int32)
        | (right.astype(jnp.int32) << 3)
        | (jnp.minimum(cnt.astype(jnp.int32), 0xFFFF) << 6)
    )
    return jnp.where(valid, meta, 0)


# shared exchange machinery lives in parallel/exchange.py (one abstraction
# for the count step AND the distributed traversal, like the reference's
# single ThreeTierAggrStore)
_round_exchange = exchange.round_exchange


def _insert_from_buffers(table: ShardTable, hi, lo, meta, k: int,
                         high_load: bool = False) -> ShardTable:
    valid = meta != 0
    left = meta & 7
    right = (meta >> 3) & 7
    cnt = meta >> 6
    return shard_table.insert_batch(
        table, hi, lo, left, right, cnt, valid, full_hi_range=k >= 32,
        high_load=high_load,
    )


@_memo
def make_count_step(mesh: Mesh, *, k: int, exchange_cap: int, m: int | None = None,
                    max_rounds: int = 0, high_load: bool = False):
    """Build the jitted sharded count step for a device mesh with axis 'sh'.

    Returns step(state, codes, badq, lengths) -> state where codes/badq/
    lengths are globally-shaped arrays sharded over reads on axis 0 and state
    is a ShardedState sharded over axis 0.
    """
    n_shards = mesh.shape["sh"]

    def per_device(state: ShardedState, codes, badq, lengths):
        recs = kmer_records(codes, badq, lengths, k=k, m=m, n_shards=n_shards)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        cnt = jnp.ones_like(flat["left"])
        meta = _pack_meta(flat["left"], flat["right"], cnt, flat["valid"])
        local = _local_table(state)
        if n_shards > 1:
            def ins(tbl, rhi, rlo, rmeta):
                return _insert_from_buffers(tbl, rhi, rlo, rmeta.astype(jnp.int32),
                                            k, high_load)

            local, spill, overflow = _round_exchange(
                [flat["canon_hi"], flat["canon_lo"], meta], flat["target"],
                flat["valid"], n_shards, exchange_cap, ins, local, max_rounds,
            )
        else:
            spill = overflow = jnp.zeros((), jnp.int32)
            local = _insert_from_buffers(
                local, flat["canon_hi"], flat["canon_lo"], meta, k, high_load
            )
        return ShardedState(
            keys_hi=local.keys_hi[None],
            keys_lo=local.keys_lo[None],
            counts=local.counts[None],
            extc=local.extc[None],
            claim=local.claim[None],
            num_dropped=local.num_dropped[None],
            overflow=(state.overflow[0] + overflow)[None],
            spill_rounds=(state.spill_rounds[0] + spill)[None],
        )

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(_STATE_SPEC, P("sh", None), P("sh", None), P("sh")),
        out_specs=_STATE_SPEC,
    )
    return jax.jit(mapped, donate_argnums=(0,))


@_memo
def make_finalize(mesh: Mesh, dmin_thres: int = 2, donate: bool = False):
    """Build the jitted sharded finalize: per-shard ext calling + purge.

    donate=True donates the table state (callers must read every state
    scalar/probe-stat BEFORE finalizing): at reference scale the state is
    ~6 GB/chip and finalize's own outputs+temps do not fit HBM alongside an
    undonated copy (measured RESOURCE_EXHAUSTED on a 16 GB v5e)."""
    lut = jnp.asarray(shard_table._dmin_lut(dmin_thres))

    def per_device(state: ShardedState, lut_rep):
        fin = shard_table._finalize_jit(_local_table(state), lut_rep)
        return jax.tree.map(lambda x: x[None], fin)

    fin_spec = shard_table.FinalizedShard(
        keys_hi=P("sh", None),
        keys_lo=P("sh", None),
        counts=P("sh", None),
        left_ext=P("sh", None),
        right_ext=P("sh", None),
        keep=P("sh", None),
        num_kept=P("sh"),
        sum_counts=P("sh"),
        num_purged=P("sh"),
    )
    mapped = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(_STATE_SPEC, P(None)),
            out_specs=fin_spec,
        ),
        donate_argnums=(0,) if donate else (),
    )

    def finalize_fn(state):
        return mapped(state, lut)

    return finalize_fn


@_memo
def make_compact_fin(mesh: Mesh, K: int, donate: bool = False):
    """Jitted sharded wrapper for shard_table.compact_fin: [n_shards, cap]
    finalized arrays -> [n_shards, K] kept-only arrays (per-shard, no
    collectives).  donate=True frees the full-capacity finalized arrays as
    they are consumed (they cannot alias the smaller outputs, but early
    free halves peak HBM during compaction)."""
    fin_spec = shard_table.FinalizedShard(
        keys_hi=P("sh", None),
        keys_lo=P("sh", None),
        counts=P("sh", None),
        left_ext=P("sh", None),
        right_ext=P("sh", None),
        keep=P("sh", None),
        num_kept=P("sh"),
        sum_counts=P("sh"),
        num_purged=P("sh"),
    )

    def per_device(fin):
        local = jax.tree.map(lambda x: x[0], fin)
        out = shard_table.compact_fin(local, K)
        return jax.tree.map(lambda x: x[None], out)

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(fin_spec,), out_specs=fin_spec,
    ), donate_argnums=(0,) if donate else ())


@_memo
def make_compact_fin_mw(mesh: Mesh, K: int, donate: bool = False):
    """Multi-word variant of make_compact_fin."""
    fin_spec = stmw.FinalizedMW(
        keys=P("sh", None, None),
        counts=P("sh", None),
        left_ext=P("sh", None),
        right_ext=P("sh", None),
        keep=P("sh", None),
        num_kept=P("sh"),
        sum_counts=P("sh"),
        num_purged=P("sh"),
    )

    def per_device(fin):
        local = jax.tree.map(lambda x: x[0], fin)
        out = stmw.compact_fin_mw(local, K)
        return jax.tree.map(lambda x: x[None], out)

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(fin_spec,), out_specs=fin_spec,
    ), donate_argnums=(0,) if donate else ())


def unpack_batch(code2, nmask, badq_bits, max_len: int):
    """Device-side unpack of PackedBatch planes to (codes [B,L], badq [B,L]).

    codes: 0-3 ACGT with N restored to 4; elementwise shifts only (cheap VPU
    work traded for 4x fewer h2d bytes)."""
    B = code2.shape[0]
    c = code2.astype(jnp.uint8)
    # [B, L4//4] -> [B, L4] via per-position shift
    l4 = c.shape[1] * 4
    rep = jnp.repeat(c, 4, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, l4), 1) % 4
    codes = (rep >> ((3 - pos).astype(jnp.uint8) * 2)) & 3
    codes = codes[:, :max_len].astype(jnp.int32)

    def unbits(bits):
        rep8 = jnp.repeat(bits.astype(jnp.uint8), 8, axis=1)
        p8 = jax.lax.broadcasted_iota(jnp.int32, rep8.shape, 1) % 8
        return ((rep8 >> (7 - p8).astype(jnp.uint8)) & 1)[:, :max_len].astype(bool)

    is_n = unbits(nmask)
    badq = unbits(badq_bits)
    codes = jnp.where(is_n, 4, codes)
    return codes, badq


@_memo
def make_packed_count_step(mesh: Mesh, *, k: int, exchange_cap: int, m: int | None = None,
                           max_len: int, supermers: bool = False, max_rounds: int = 0,
                           table_mode: str = "plain", high_load: bool = False):
    """Count step taking bit-packed input planes (see ReadBatch.pack, 0.5
    B/base + masks on the h2d wire); with `supermers` the multi-shard
    exchange uses the compressed supermer wire.  table_mode selects the
    owner-side table family: "plain" (k <= 32), "qf" (--use-qf), or "mw"
    (k > 32) — all share the (state, codes, badq, lengths) step signature."""
    if table_mode == "mwqf":
        inner = make_count_step_qf_mw(mesh, k=k, exchange_cap=exchange_cap, m=m,
                                      max_rounds=max_rounds, supermers=supermers,
                                      high_load=high_load)
    elif table_mode == "mw":
        inner = make_count_step_mw(mesh, k=k, exchange_cap=exchange_cap, m=m,
                                   max_rounds=max_rounds, supermers=supermers,
                                   high_load=high_load)
    elif table_mode == "qf":
        inner = make_count_step_qf(mesh, k=k, exchange_cap=exchange_cap, m=m,
                                   max_rounds=max_rounds, supermers=supermers,
                                   high_load=high_load)
    elif supermers and mesh.shape["sh"] > 1:
        inner = make_count_step_supermer(mesh, k=k, exchange_cap=exchange_cap, m=m,
                                         max_rounds=max_rounds, high_load=high_load)
    else:
        inner = make_count_step(mesh, k=k, exchange_cap=exchange_cap, m=m,
                                max_rounds=max_rounds, high_load=high_load)
    n_shards = mesh.shape["sh"]

    def per_device_unpack(code2, nmask, badq_bits):
        return unpack_batch(code2, nmask, badq_bits, max_len)

    unpack = jax.shard_map(
        per_device_unpack,
        mesh=mesh,
        in_specs=(P("sh", None), P("sh", None), P("sh", None)),
        out_specs=(P("sh", None), P("sh", None)),
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, code2, nmask, badq_bits, lengths):
        codes, badq = unpack(code2, nmask, badq_bits)
        return inner(state, codes, badq, lengths)

    return step


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, ("sh",))


@_memo
def make_ctg_step(mesh: Mesh, *, k: int, exchange_cap: int, dmin_thres: int = 2,
                  m: int | None = None, max_rounds: int = 0):
    """Contig-kmer pass (the add_ctg_kmers stage, src/kcount/kcount.cpp:106-140,
    unreachable in the reference proxy; enabled here with --ctg-kmers): routes
    the previous round's contig k-mers with their depths and applies the
    from-ctg insert rules (shard_table.insert_ctg_batch)."""
    n_shards = mesh.shape["sh"]
    lut = jnp.asarray(shard_table._dmin_lut(dmin_thres))

    def per_device(state: ShardedState, codes, badq, lengths, depths, lut_rep):
        recs = kmer_records(codes, badq, lengths, k=k, m=m, n_shards=n_shards)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        L = codes.shape[1]
        cnt = jnp.repeat(depths.astype(jnp.int32), L)
        meta = _pack_meta(flat["left"], flat["right"], cnt, flat["valid"])
        local = _local_table(state)

        def ins(tbl, rhi, rlo, rmeta):
            rmeta = rmeta.astype(jnp.int32)
            return shard_table.insert_ctg_batch(
                tbl, rhi, rlo, rmeta & 7, (rmeta >> 3) & 7, rmeta >> 6,
                rmeta != 0, lut_rep,
            )

        if n_shards > 1:
            local, spill, overflow = _round_exchange(
                [flat["canon_hi"], flat["canon_lo"], meta], flat["target"],
                flat["valid"], n_shards, exchange_cap, ins, local, max_rounds,
            )
        else:
            spill = overflow = jnp.zeros((), jnp.int32)
            local = ins(local, flat["canon_hi"], flat["canon_lo"], meta)
        return ShardedState(
            keys_hi=local.keys_hi[None],
            keys_lo=local.keys_lo[None],
            counts=local.counts[None],
            extc=local.extc[None],
            claim=local.claim[None],
            num_dropped=local.num_dropped[None],
            overflow=(state.overflow[0] + overflow)[None],
            spill_rounds=(state.spill_rounds[0] + spill)[None],
        )

    mapped = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(_STATE_SPEC, P("sh", None), P("sh", None), P("sh"), P("sh"), P(None)),
            out_specs=_STATE_SPEC,
        ),
        donate_argnums=(0,),
    )

    def step(state, codes, badq, lengths, depths):
        return mapped(state, codes, badq, lengths, depths, lut)

    return step


# ---------------------------------------------------------------------------
# supermer-compressed exchange (k <= 32)
# ---------------------------------------------------------------------------


# supermer run-length cap: one window = max_run k-mers + one halo base each
# side.  Shared by every wire user AND analysis.py's collective-bytes
# bookkeeping — change it here only.
SUPERMER_MAX_RUN = 16


def _supermer_words(k: int, max_run: int) -> tuple:
    """(n_base_words, n_mask_words, bases_per_supermer)."""
    bases = max_run + k + 1  # run kmers + one halo base each side
    return (-(-bases // 16), -(-bases // 32), bases)


def _recv_kmer_records(k: int, insert_fn, max_run: int):
    """k <= 32 supermer receiver: re-extract canonical hi/lo records from the
    unpacked windows and feed insert_fn(carry, hi, lo, left, right, cnt,
    valid) — used by the plain-table and --use-qf steps.

    Records are COMPACTED before the insert: at most ``max_run`` of the SB
    window positions are countable k-mers (valid <= run_len <= max_run), so
    packing the valid lanes into rS*max_run slots is lossless by
    construction and cuts the table kernel's lane count ~SB/max_run (~2.4x;
    the r4 receiver fed the full padded [rS, SB] flattening into the insert,
    measured as the dominant term of the supermer wire's 5-8x gap vs the
    record wire — BASELINE.md round 5)."""

    def receive(carry, rcodes, rinv, rlengths, rcount):
        rS, SB = rcodes.shape
        sub = kmer_records(rcodes, rinv, rlengths, k=k, n_shards=1)
        fl = {kk: v.reshape(-1) for kk, v in sub.items()}
        cnt = jnp.repeat(rcount, SB)
        val = fl["valid"] & (cnt > 0)
        S = rS * max_run
        (chi, clo, cl, cr, cc), act, _, _, _ = shard_table._compact_sort(
            [fl["canon_hi"], fl["canon_lo"], fl["left"], fl["right"], cnt],
            val, S,
        )
        return insert_fn(carry, chi, clo, cl, cr, cc, act)

    return receive


def _supermer_rounds(codes, badq, lengths, *, k, m, max_run, n_shards, cap,
                     max_rounds, receive_fn, carry, route_fn=None):
    """The supermer wire's per-device machinery with pluggable routing and
    receiver: build owner runs, exchange packed 2-bit windows in spill
    rounds, and feed receive_fn(carry, rcodes, rinv, rlengths, rcount) with
    each round's unpacked windows.

    route_fn(codes, badq, lengths) -> (target, valid) overrides the k <= 32
    per-position routing (multi-word tables route via kmer_records_mw).
    Returns (carry, spill_rounds, overflow).  Shared by the plain-table,
    --use-qf, and multi-word steps (the reference ships Supermers regardless
    of backend, src/kcount/kmer_dht.cpp:247-250).
    """
    BW, MW, SB = _supermer_words(k, max_run)
    B, L = codes.shape
    if route_fn is None:
        recs = kmer_records(codes, badq, lengths, k=k, m=m, n_shards=n_shards)
        target, valid = recs["target"], recs["valid"]
    else:
        target, valid = route_fn(codes, badq, lengths)
    R = B * L
    flat_t = target.reshape(-1)
    flat_v = valid.reshape(-1)
    pos_in_row = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1).reshape(-1)

    prev_v = jnp.roll(flat_v, 1).at[0].set(False)
    prev_t = jnp.roll(flat_t, 1)
    # rows never chain: the last positions of a row are always invalid
    # (valid <= len-k-1), so ~prev_v triggers at every row boundary
    new_run = flat_v & (~prev_v | (prev_t != flat_t) | (pos_in_row == 1))
    # forced split every max_run positions within a run
    idx = jnp.arange(R, dtype=jnp.int32)
    run_start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_run, idx, -1)
    )
    within = idx - run_start_idx
    forced = flat_v & (within > 0) & (within % max_run == 0)
    start = new_run | forced
    # recompute run start indices including forced splits
    run_start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, idx, -1)
    )
    run_len_max = jnp.where(flat_v, idx - run_start_idx + 1, 0)

    # per-run arrays, R-sized (every run covers >= 1 position so the run
    # count is bounded by R); run id = rank of the run's start position
    run_slot_of_pos = jnp.cumsum(start.astype(jnp.int32)) - 1
    run_slot_of_pos = jnp.where(flat_v, run_slot_of_pos, R)
    n_runs = jnp.sum(start).astype(jnp.int32)
    run_len = jnp.zeros((R,), jnp.int32).at[run_slot_of_pos].max(
        run_len_max, mode="drop"
    )
    run_len = jnp.minimum(run_len, max_run)
    slot_of_start = jnp.where(start, run_slot_of_pos, R)
    run_start = jnp.zeros((R,), jnp.int32).at[slot_of_start].set(idx, mode="drop")
    run_tgt = jnp.full((R,), n_shards, jnp.int32).at[slot_of_start].set(
        flat_t.astype(jnp.int32), mode="drop"
    )

    # sort runs by destination once; rounds peel cap-sized windows
    run_ok = idx < n_runs
    order, tgt, col, rounds, lost = exchange.sorted_dest(
        run_tgt, run_ok, n_shards, cap, max_rounds
    )
    # overflow counts LOST K-MERS (records), not runs
    sorted_len = run_len[order]
    overflow = jnp.sum(jnp.where(lost, sorted_len, 0)).astype(jnp.int32)

    codes_g = jnp.where(codes >= 4, 2, codes).astype(jnp.uint32).reshape(-1)
    ext_inv = (badq | (codes >= 4)).reshape(-1)
    offs = jnp.arange(SB, dtype=jnp.int32)
    word_of = offs // 16
    shift_of = (offs % 16) * 2
    mword_of = offs // 32
    mshift = offs % 32
    Scap = n_shards * cap  # per-round compact window count
    Wn = BW + MW + 1

    def body(r, local):
        in_r = (col >= r * cap) & (col < (r + 1) * cap) & (tgt < n_shards)
        sel = jnp.nonzero(in_r, size=Scap, fill_value=R)[0]
        ok = sel < R
        sel_c = jnp.clip(sel, 0, R - 1)
        rid = order[sel_c]
        s_start = run_start[rid]
        s_len = jnp.where(ok, run_len[rid], 0)
        s_row = jnp.where(ok, tgt[sel_c], n_shards)
        s_col = jnp.clip(col[sel_c] - r * cap, 0, cap - 1)

        # gather + pack base windows (start-1 .. start-1+SB)
        row_of = s_start // L
        col0 = (s_start % L) - 1
        gcols = jnp.clip(col0[:, None] + offs[None, :], 0, L - 1)
        gidx = row_of[:, None] * L + gcols
        win_codes = codes_g[gidx]  # [Scap, SB]
        win_inv = ext_inv[gidx]
        # pack: base j -> word j//16, bits 2*(j%16) (little-endian in word)
        bwords = []
        for w in range(BW):
            selw = word_of == w
            vals = jnp.where(selw[None, :], win_codes << shift_of[None, :].astype(jnp.uint32), 0)
            bwords.append(jnp.sum(vals, axis=1, dtype=jnp.uint32))
        mwords = []
        for w in range(MW):
            selw = mword_of == w
            vals = jnp.where(selw[None, :] & win_inv, jnp.uint32(1) << mshift[None, :].astype(jnp.uint32), 0)
            mwords.append(jnp.sum(vals, axis=1, dtype=jnp.uint32))
        meta = jnp.where(ok, s_len | (1 << 8), 0)  # count=1 in bits 8+
        planes = jnp.stack(bwords + mwords + [meta.astype(jnp.uint32)], axis=0)

        buf = jnp.zeros((n_shards, Wn, cap), jnp.uint32)
        for w in range(Wn):
            buf = buf.at[s_row, w, s_col].set(planes[w], mode="drop")
        buf = jax.lax.all_to_all(buf, "sh", 0, 0, tiled=True)

        # receiver: unpack supermers into windows, re-extract k-mers, insert
        rS = n_shards * cap
        rplanes = buf.transpose(1, 0, 2).reshape(Wn, rS)
        rmeta = rplanes[Wn - 1]
        rlen = (rmeta & 0xFF).astype(jnp.int32)
        rcount = (rmeta >> 8).astype(jnp.int32)
        rb = [rplanes[w] for w in range(BW)]
        rm = [rplanes[BW + w] for w in range(MW)]
        base_cols, inv_cols = [], []
        for j in range(SB):
            w, sh = j // 16, (j % 16) * 2
            base_cols.append(((rb[w] >> jnp.uint32(sh)) & jnp.uint32(3)).astype(jnp.int32))
            mw_, msh = j // 32, j % 32
            inv_cols.append(((rm[mw_] >> jnp.uint32(msh)) & jnp.uint32(1)).astype(bool))
        rcodes = jnp.stack(base_cols, axis=1)  # [rS, SB]
        rinv = jnp.stack(inv_cols, axis=1)
        rlengths = jnp.where(rlen > 0, rlen + k + 1, 0)
        return receive_fn(local, rcodes, rinv, rlengths, rcount)

    carry = jax.lax.fori_loop(0, rounds, body, carry)
    return carry, jnp.maximum(rounds - 1, 0).astype(jnp.int32), overflow


@_memo
def make_count_step_supermer(mesh: Mesh, *, k: int, exchange_cap: int,
                             high_load: bool = False,
                             m: int | None = None, max_run: int = SUPERMER_MAX_RUN,
                             max_rounds: int = 0):
    """Sharded count step exchanging SUPERMERS instead of per-k-mer records.

    This is the reference's Supermer wire format (src/kcount/kmer_dht.hpp:78-90,
    pack/unpack at kmer_dht.cpp:69-100) rebuilt for fixed shapes: maximal runs
    of consecutive k-mers sharing an owner (capped at `max_run`) ship as
    2-bit-packed base windows of run+k+1 bases — the first/last base being the
    halo flanks, exactly the reference convention where the owner-side
    expansion skips the padded window's first and last k-mer
    (src/kcount/kcount_cpu.cpp:308-336) — plus an ext-invalid bitmask (the
    upper/lowercase quality trick as a bit-plane) and a meta word
    (run_len | count).  The receiver re-runs the canonical extraction on the
    unpacked windows (owner-side recompute, like the reference's
    get_kmers_and_exts), so counts are bit-identical to the k-mer-record
    exchange.  Wire cost ~24 B/supermer vs 12 B/k-mer — a 2-3x traffic
    reduction at typical 4-6-k-mer runs, matching the reference's logged
    supermer compression (kcount_cpu.cpp:107-112).

    Like the record exchange, delivery is LOSSLESS: supermers are sorted by
    destination once, and cap-sized per-destination windows ship in spill
    rounds (uniform trip count via pmax) until all queues drain.  Each
    round's windows are compacted with a fixed-size nonzero so pack/gather
    cost stays O(n_shards * cap) per round.
    """
    n_shards = mesh.shape["sh"]
    assert n_shards > 1, "supermer exchange only makes sense with >1 shard"

    def per_device(state: ShardedState, codes, badq, lengths):
        def ins(local, hi, lo, left, right, cnt, valid):
            return shard_table.insert_batch(
                local, hi, lo, left, right, cnt, valid, full_hi_range=k >= 32,
                high_load=high_load,
            )

        local, spill, overflow = _supermer_rounds(
            codes, badq, lengths, k=k, m=m, max_run=max_run,
            n_shards=n_shards, cap=exchange_cap, max_rounds=max_rounds,
            receive_fn=_recv_kmer_records(k, ins, max_run),
            carry=_local_table(state),
        )
        return ShardedState(
            keys_hi=local.keys_hi[None],
            keys_lo=local.keys_lo[None],
            counts=local.counts[None],
            extc=local.extc[None],
            claim=local.claim[None],
            num_dropped=local.num_dropped[None],
            overflow=(state.overflow[0] + overflow)[None],
            spill_rounds=(state.spill_rounds[0] + spill)[None],
        )

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(_STATE_SPEC, P("sh", None), P("sh", None), P("sh")),
        out_specs=_STATE_SPEC,
    )
    return jax.jit(mapped, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# --use-qf variant: singleton-filter offload (k <= 32)
# ---------------------------------------------------------------------------

from ..table import singleton_filter as sf  # noqa: E402


class QFShardedState(NamedTuple):
    table: ShardedState
    f_fp: jax.Array  # [n_shards, fcap]
    f_meta: jax.Array
    f_claim: jax.Array
    f_stored: jax.Array  # [n_shards]


_QF_STATE_SPEC = QFShardedState(
    table=_STATE_SPEC,
    f_fp=P("sh", None),
    f_meta=P("sh", None),
    f_claim=P("sh", None),
    f_stored=P("sh"),
)


def create_sharded_qf(n_shards: int, max_elems_per_shard: int,
                      filter_elems_per_shard: int, mesh: Mesh | None = None) -> QFShardedState:
    def build():
        base = create_sharded(n_shards, max_elems_per_shard, mesh=None)
        one = sf.create_filter(filter_elems_per_shard)

        def rep(x):
            return jnp.broadcast_to(x[None], (n_shards,) + x.shape)

        return QFShardedState(
            table=base,
            f_fp=rep(one.fp),
            f_meta=rep(one.meta),
            f_claim=rep(one.claim),
            f_stored=jnp.zeros((n_shards,), jnp.int32),
        )

    if mesh is not None:
        return _sharded_init(mesh, _QF_STATE_SPEC, build)
    return build()


@_memo
def make_count_step_qf(mesh: Mesh, *, k: int, exchange_cap: int, m: int | None = None,
                       high_load: bool = False,
                       max_rounds: int = 0, supermers: bool = False):
    """Sharded count step with singleton-filter offload (--use-qf).

    `supermers` rides the compressed supermer wire like the plain-table step
    (the reference ships Supermers regardless of backend/TCF mode,
    src/kcount/kmer_dht.cpp:247-250)."""
    n_shards = mesh.shape["sh"]

    def per_device(state: QFShardedState, codes, badq, lengths):
        local = _local_table(state.table)
        filt = sf.SingletonFilter(
            fp=state.f_fp[0], meta=state.f_meta[0], claim=state.f_claim[0],
            num_stored=state.f_stored[0],
        )

        if supermers and n_shards > 1:
            def ins_sm(carry, hi, lo, left, right, cnt, valid):
                tbl, flt = carry
                return sf.insert_batch_qf(tbl, flt, hi, lo, left, right, cnt,
                                          valid, high_load=high_load)

            (local, filt), spill, overflow = _supermer_rounds(
                codes, badq, lengths, k=k, m=m, max_run=SUPERMER_MAX_RUN,
                n_shards=n_shards, cap=exchange_cap, max_rounds=max_rounds,
                receive_fn=_recv_kmer_records(k, ins_sm, SUPERMER_MAX_RUN),
                carry=(local, filt),
            )
            return _pack_qf_state(state, local, filt, spill, overflow)

        recs = kmer_records(codes, badq, lengths, k=k, m=m, n_shards=n_shards)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        cnt = jnp.ones_like(flat["left"])
        meta = _pack_meta(flat["left"], flat["right"], cnt, flat["valid"])

        def ins(carry, rhi, rlo, rmeta):
            tbl, flt = carry
            rmeta = rmeta.astype(jnp.int32)
            return sf.insert_batch_qf(
                tbl, flt, rhi, rlo, rmeta & 7, (rmeta >> 3) & 7, rmeta >> 6,
                rmeta != 0, high_load=high_load,
            )

        if n_shards > 1:
            (local, filt), spill, overflow = _round_exchange(
                [flat["canon_hi"], flat["canon_lo"], meta], flat["target"],
                flat["valid"], n_shards, exchange_cap, ins, (local, filt),
                max_rounds,
            )
        else:
            spill = overflow = jnp.zeros((), jnp.int32)
            local, filt = ins((local, filt), flat["canon_hi"], flat["canon_lo"], meta)
        return _pack_qf_state(state, local, filt, spill, overflow)

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(_QF_STATE_SPEC, P("sh", None), P("sh", None), P("sh")),
        out_specs=_QF_STATE_SPEC,
    )
    return jax.jit(mapped, donate_argnums=(0,))


class MWQFShardedState(NamedTuple):
    """Multi-word table + singleton filter (--use-qf with k > 32)."""

    table: "MWShardedState"
    f_fp: jax.Array
    f_meta: jax.Array
    f_claim: jax.Array
    f_stored: jax.Array


def create_sharded_qf_mw(n_shards: int, max_elems_per_shard: int, k: int,
                         filter_elems_per_shard: int,
                         mesh: Mesh | None = None) -> MWQFShardedState:
    def build():
        base = create_sharded_mw(n_shards, max_elems_per_shard, k, mesh=None)
        one = sf.create_filter(filter_elems_per_shard)

        def rep(x):
            return jnp.broadcast_to(x[None], (n_shards,) + x.shape)

        return MWQFShardedState(
            table=base,
            f_fp=rep(one.fp),
            f_meta=rep(one.meta),
            f_claim=rep(one.claim),
            f_stored=jnp.zeros((n_shards,), jnp.int32),
        )

    if mesh is not None:
        spec = MWQFShardedState(
            table=_MW_STATE_SPEC,
            f_fp=P("sh", None),
            f_meta=P("sh", None),
            f_claim=P("sh", None),
            f_stored=P("sh"),
        )
        return _sharded_init(mesh, spec, build)
    return build()


@_memo
def make_count_step_qf_mw(mesh: Mesh, *, k: int, exchange_cap: int,
                          high_load: bool = False,
                          m: int | None = None, max_rounds: int = 0,
                          supermers: bool = False):
    """Multi-word sharded count step with singleton-filter offload
    (--use-qf for k > 32 — the reference's TCF keys on a hash of the full
    k-mer for any MAX_K, gpu_hash_table.cpp:441-446)."""
    from ..ops.kmer_multiword import kmer_records_mw, n_words

    n_shards = mesh.shape["sh"]
    Wn = n_words(k)

    def per_device(state: MWQFShardedState, codes, badq, lengths):
        local = _local_table_mw(state.table)
        filt = sf.SingletonFilter(
            fp=state.f_fp[0], meta=state.f_meta[0], claim=state.f_claim[0],
            num_stored=state.f_stored[0],
        )

        def ins_words(carry, swords, sleft, sright, scnt, svalid):
            tbl, flt = carry
            return sf.insert_batch_qf_mw(tbl, flt, swords, sleft, sright,
                                         scnt, svalid, high_load=high_load)

        if supermers and n_shards > 1:
            def route(codes_, badq_, lengths_):
                r = kmer_records_mw(codes_, badq_, lengths_, k=k, m=m,
                                    n_shards=n_shards)
                return r["target"], r["valid"]

            def receive(carry, rcodes, rinv, rlengths, rcount):
                rS, SB = rcodes.shape
                sub = kmer_records_mw(rcodes, rinv, rlengths, k=k, n_shards=1)
                swords = sub["canon"].reshape(Wn, rS * SB)
                cnt_ = jnp.repeat(rcount, SB)
                val = sub["valid"].reshape(-1) & (cnt_ > 0)
                # lossless pre-insert compaction (see _recv_kmer_records)
                arrs, act, _, _, _ = shard_table._compact_sort(
                    [*swords, sub["left"].reshape(-1),
                     sub["right"].reshape(-1), cnt_],
                    val, rS * SUPERMER_MAX_RUN,
                )
                return ins_words(carry, jnp.stack(arrs[:Wn], axis=0),
                                 arrs[Wn], arrs[Wn + 1], arrs[Wn + 2], act)

            (local, filt), spill, overflow = _supermer_rounds(
                codes, badq, lengths, k=k, m=m, max_run=SUPERMER_MAX_RUN,
                n_shards=n_shards, cap=exchange_cap, max_rounds=max_rounds,
                receive_fn=receive, carry=(local, filt), route_fn=route,
            )
        else:
            recs = kmer_records_mw(codes, badq, lengths, k=k, m=m,
                                   n_shards=n_shards)
            B, L = codes.shape
            words = recs["canon"].reshape(Wn, B * L)
            left = recs["left"].reshape(-1)
            right = recs["right"].reshape(-1)
            valid = recs["valid"].reshape(-1)
            target = recs["target"].reshape(-1)
            cnt = jnp.ones_like(left)
            meta = _pack_meta(left, right, cnt, valid)

            def ins(carry, *received):
                rwords = jnp.stack(received[:Wn], axis=0)
                rmeta = received[Wn].astype(jnp.int32)
                return ins_words(carry, rwords, rmeta & 7, (rmeta >> 3) & 7,
                                 rmeta >> 6, rmeta != 0)

            if n_shards > 1:
                planes = [words[j] for j in range(Wn)] + [meta]
                (local, filt), spill, overflow = _round_exchange(
                    planes, target, valid, n_shards, exchange_cap, ins,
                    (local, filt), max_rounds,
                )
            else:
                spill = overflow = jnp.zeros((), jnp.int32)
                local, filt = ins_words((local, filt), words, left, right,
                                        cnt, valid)
        base = MWShardedState(
            keys=local.keys[None],
            counts=local.counts[None],
            extc=local.extc[None],
            claim=local.claim[None],
            num_dropped=local.num_dropped[None],
            overflow=(state.table.overflow[0] + overflow)[None],
            spill_rounds=(state.table.spill_rounds[0] + spill)[None],
        )
        return MWQFShardedState(
            table=base,
            f_fp=filt.fp[None],
            f_meta=filt.meta[None],
            f_claim=filt.claim[None],
            f_stored=filt.num_stored[None],
        )

    spec = MWQFShardedState(
        table=_MW_STATE_SPEC,
        f_fp=P("sh", None),
        f_meta=P("sh", None),
        f_claim=P("sh", None),
        f_stored=P("sh"),
    )
    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(spec, P("sh", None), P("sh", None), P("sh")),
        out_specs=spec,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def _pack_qf_state(state: QFShardedState, local, filt, spill, overflow) -> QFShardedState:
    base = ShardedState(
        keys_hi=local.keys_hi[None],
        keys_lo=local.keys_lo[None],
        counts=local.counts[None],
        extc=local.extc[None],
        claim=local.claim[None],
        num_dropped=local.num_dropped[None],
        overflow=(state.table.overflow[0] + overflow)[None],
        spill_rounds=(state.table.spill_rounds[0] + spill)[None],
    )
    return QFShardedState(
        table=base,
        f_fp=filt.fp[None],
        f_meta=filt.meta[None],
        f_claim=filt.claim[None],
        f_stored=filt.num_stored[None],
    )


# ---------------------------------------------------------------------------
# multi-word (k > 32) variants
# ---------------------------------------------------------------------------

from ..ops.kmer_multiword import kmer_records_mw, n_words  # noqa: E402
from ..table import shard_table_mw as stmw  # noqa: E402


class MWShardedState(NamedTuple):
    keys: jax.Array  # [n_shards, W*cap] (flat per-shard keys, see MWShardTable)
    counts: jax.Array
    extc: jax.Array
    claim: jax.Array
    num_dropped: jax.Array
    overflow: jax.Array
    spill_rounds: jax.Array


_MW_STATE_SPEC = MWShardedState(
    keys=P("sh", None),
    counts=P("sh", None),
    extc=P("sh", None),
    claim=P("sh", None),
    num_dropped=P("sh"),
    overflow=P("sh"),
    spill_rounds=P("sh"),
)


def create_sharded_mw(n_shards: int, max_elems_per_shard: int, k: int, mesh: Mesh | None = None) -> MWShardedState:
    def build():
        one = stmw.create(max_elems_per_shard, n_words(k))

        def rep(x):
            return jnp.broadcast_to(x[None], (n_shards,) + x.shape)

        return MWShardedState(
            keys=rep(one.keys),
            counts=rep(one.counts),
            extc=rep(one.extc),
            claim=rep(one.claim),
            num_dropped=jnp.zeros((n_shards,), jnp.int32),
            overflow=jnp.zeros((n_shards,), jnp.int32),
            spill_rounds=jnp.zeros((n_shards,), jnp.int32),
        )

    if mesh is not None:
        return _sharded_init(mesh, _MW_STATE_SPEC, build)
    return build()


def _local_table_mw(state: MWShardedState) -> stmw.MWShardTable:
    return stmw.MWShardTable(
        keys=state.keys[0],
        counts=state.counts[0],
        extc=state.extc[0],
        claim=state.claim[0],
        num_dropped=state.num_dropped[0],
    )


@_memo
def make_count_step_mw(mesh: Mesh, *, k: int, exchange_cap: int, m: int | None = None,
                       high_load: bool = False,
                       max_rounds: int = 0, supermers: bool = False):
    """Multi-word sharded count step (same design as make_count_step).

    `supermers` rides the compressed supermer wire: windows are 2-bit bases
    (k-agnostic), the receiver re-extracts multi-word records with
    kmer_records_mw — compression grows with k (one ~max_run-k-mer window
    vs max_run W-word records)."""
    n_shards = mesh.shape["sh"]
    Wn = n_words(k)

    def per_device(state: MWShardedState, codes, badq, lengths):
        if supermers and n_shards > 1:
            def route(codes_, badq_, lengths_):
                r = kmer_records_mw(codes_, badq_, lengths_, k=k, m=m,
                                    n_shards=n_shards)
                return r["target"], r["valid"]

            def receive(tbl, rcodes, rinv, rlengths, rcount):
                rS, SB = rcodes.shape
                sub = kmer_records_mw(rcodes, rinv, rlengths, k=k, n_shards=1)
                swords = sub["canon"].reshape(Wn, rS * SB)
                cnt = jnp.repeat(rcount, SB)
                val = sub["valid"].reshape(-1) & (cnt > 0)
                # lossless pre-insert compaction (see _recv_kmer_records)
                arrs, act, _, _, _ = shard_table._compact_sort(
                    [*swords, sub["left"].reshape(-1),
                     sub["right"].reshape(-1), cnt],
                    val, rS * SUPERMER_MAX_RUN,
                )
                return stmw.insert_batch_mw(
                    tbl, jnp.stack(arrs[:Wn], axis=0), arrs[Wn],
                    arrs[Wn + 1], arrs[Wn + 2], act,
                    w0_full_range=(k % 16 == 0), high_load=high_load,
                )

            local, spill, overflow = _supermer_rounds(
                codes, badq, lengths, k=k, m=m, max_run=SUPERMER_MAX_RUN,
                n_shards=n_shards, cap=exchange_cap, max_rounds=max_rounds,
                receive_fn=receive, carry=_local_table_mw(state),
                route_fn=route,
            )
            return MWShardedState(
                keys=local.keys[None],
                counts=local.counts[None],
                extc=local.extc[None],
                claim=local.claim[None],
                num_dropped=local.num_dropped[None],
                overflow=(state.overflow[0] + overflow)[None],
                spill_rounds=(state.spill_rounds[0] + spill)[None],
            )

        recs = kmer_records_mw(codes, badq, lengths, k=k, m=m, n_shards=n_shards)
        B, L = codes.shape
        words = recs["canon"].reshape(Wn, B * L)
        left = recs["left"].reshape(-1)
        right = recs["right"].reshape(-1)
        valid = recs["valid"].reshape(-1)
        target = recs["target"].reshape(-1)
        cnt = jnp.ones_like(left)
        meta = _pack_meta(left, right, cnt, valid)
        local = _local_table_mw(state)
        if n_shards > 1:
            def ins(tbl, *received):
                rwords = jnp.stack(received[:Wn], axis=0)
                rmeta = received[Wn].astype(jnp.int32)
                return stmw.insert_batch_mw(
                    tbl, rwords, rmeta & 7, (rmeta >> 3) & 7, rmeta >> 6,
                    rmeta != 0, w0_full_range=(k % 16 == 0),
                    high_load=high_load,
                )

            planes = [words[j] for j in range(Wn)] + [meta]
            local, spill, overflow = _round_exchange(
                planes, target, valid, n_shards, exchange_cap, ins, local,
                max_rounds,
            )
        else:
            spill = overflow = jnp.zeros((), jnp.int32)
            local = stmw.insert_batch_mw(
                local, words, meta & 7, (meta >> 3) & 7, meta >> 6, meta != 0,
                w0_full_range=(k % 16 == 0), high_load=high_load,
            )
        return MWShardedState(
            keys=local.keys[None],
            counts=local.counts[None],
            extc=local.extc[None],
            claim=local.claim[None],
            num_dropped=local.num_dropped[None],
            overflow=(state.overflow[0] + overflow)[None],
            spill_rounds=(state.spill_rounds[0] + spill)[None],
        )

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(_MW_STATE_SPEC, P("sh", None), P("sh", None), P("sh")),
        out_specs=_MW_STATE_SPEC,
    )
    return jax.jit(mapped, donate_argnums=(0,))


@_memo
def make_ctg_step_mw(mesh: Mesh, *, k: int, exchange_cap: int, dmin_thres: int = 2,
                     m: int | None = None, max_rounds: int = 0):
    """Multi-word contig-kmer pass (the k > 32 variant of make_ctg_step):
    routes the previous round's contig k-mers with depths and applies the
    from-ctg rules via shard_table_mw.insert_ctg_batch_mw."""
    n_shards = mesh.shape["sh"]
    Wn = n_words(k)
    lut = jnp.asarray(shard_table._dmin_lut(dmin_thres))

    def per_device(state: MWShardedState, codes, badq, lengths, depths, lut_rep):
        recs = kmer_records_mw(codes, badq, lengths, k=k, m=m, n_shards=n_shards)
        B, L = codes.shape
        words = recs["canon"].reshape(Wn, B * L)
        left = recs["left"].reshape(-1)
        right = recs["right"].reshape(-1)
        valid = recs["valid"].reshape(-1)
        target = recs["target"].reshape(-1)
        cnt = jnp.repeat(depths.astype(jnp.int32), L)
        meta = _pack_meta(left, right, cnt, valid)
        local = _local_table_mw(state)

        def ins(tbl, *received):
            rwords = jnp.stack(received[:Wn], axis=0)
            rmeta = received[Wn].astype(jnp.int32)
            return stmw.insert_ctg_batch_mw(
                tbl, rwords, rmeta & 7, (rmeta >> 3) & 7, rmeta >> 6,
                rmeta != 0, lut_rep,
            )

        if n_shards > 1:
            planes = [words[j] for j in range(Wn)] + [meta]
            local, spill, overflow = _round_exchange(
                planes, target, valid, n_shards, exchange_cap, ins, local,
                max_rounds,
            )
        else:
            spill = overflow = jnp.zeros((), jnp.int32)
            local = ins(local, *[words[j] for j in range(Wn)], meta)
        return MWShardedState(
            keys=local.keys[None],
            counts=local.counts[None],
            extc=local.extc[None],
            claim=local.claim[None],
            num_dropped=local.num_dropped[None],
            overflow=(state.overflow[0] + overflow)[None],
            spill_rounds=(state.spill_rounds[0] + spill)[None],
        )

    mapped = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(_MW_STATE_SPEC, P("sh", None), P("sh", None), P("sh"), P("sh"), P(None)),
            out_specs=_MW_STATE_SPEC,
        ),
        donate_argnums=(0,),
    )

    def step(state, codes, badq, lengths, depths):
        return mapped(state, codes, badq, lengths, depths, lut)

    return step


@_memo
def make_finalize_mw(mesh: Mesh, dmin_thres: int = 2, donate: bool = False):
    """Multi-word finalize; donate as in make_finalize."""
    lut = jnp.asarray(shard_table._dmin_lut(dmin_thres))

    def per_device(state: MWShardedState, lut_rep):
        fin = stmw._finalize_mw_jit(_local_table_mw(state), lut_rep)
        return jax.tree.map(lambda x: x[None], fin)

    fin_spec = stmw.FinalizedMW(
        keys=P("sh", None, None),
        counts=P("sh", None),
        left_ext=P("sh", None),
        right_ext=P("sh", None),
        keep=P("sh", None),
        num_kept=P("sh"),
        sum_counts=P("sh"),
        num_purged=P("sh"),
    )
    mapped = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(_MW_STATE_SPEC, P(None)),
            out_specs=fin_spec,
        ),
        donate_argnums=(0,) if donate else (),
    )

    def finalize_fn(state):
        return mapped(state, lut)

    return finalize_fn
