"""Memory-scalable UU-tig traversal straight from the device-resident table.

The round-2 flow gathered the ENTIRE global compact k-mer table onto every
host (then re-sharded it for --distributed-traversal) before any traversal —
O(global table) host arrays per process.  This module feeds the traversal
from the per-shard finalized tables exactly where they already live (the
reference's data model is traversal-over-the-sharded-table,
src/kcount/kmer_dht.hpp:62-68):

  1. per-shard device sort of the kept k-mers (keys stay hash-sharded by
     minimizer — the same placement the count step used);
  2. successor lookups route by the MINIMIZER of the candidate k-mer (the
     identical owner function of the count step, kmer_dht.cpp:193-196), ride
     the shared capped rr_exchange, and binary-search the owner's sorted
     shard;
  3. pointer-doubling rounds (cycle cut, terminal, head/position) resolve
     remote jumps through the same exchange — node space is shard-major, so
     node owners are a division, never a search;
  4. a distributed block-bitonic sort orders every node record by
     (chain head, position) across shards, so each shard ends up holding a
     contiguous slice of concatenated chains with EXACTLY n_local records —
     perfectly balanced, no receive-buffer overflow possible;
  5. the host then streams one shard slice at a time, stitching chains across
     slice boundaries with an O(longest contig) carry — peak host memory is
     one slice + one contig, independent of the global table size.

Cycle rotation parity: cycles are cut at the canonical orientation of their
smallest k-mer (min-canonical-value label doubling), which reproduces the
oracle walk's rotation (oracle.py utgs(): "walks leftover cycles from their
smallest member") — the mirror cycle contains no node whose oriented value
equals that minimum, stays uncut, and emits nothing.

Emitted contigs are canonical (min(seq, revcomp(seq))), matching the oracle's
contig convention; emission order is ascending head node id (deterministic
per mesh; placement-dependent across shard counts, like the per-shard dumps).
"""

from __future__ import annotations

import time

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kmer_ops import (
    _pair_lt,
    _pair_min,
    minimizer_len_for_k,
    revcomp_pairs,
    route_hash,
)
from ..parallel.exchange import AXIS, push_exchange, rr_exchange
from .utg import Utgs, _rc_vals

U32 = jnp.uint32
U64 = jnp.uint64
EMPTY = 0xFFFFFFFF
_BASES_BYTES = np.frombuffer(b"ACGT", np.uint8)


def _shift_mask_pair(h, l, shift_bits: int, keep_bits: int):
    """(value >> shift_bits) & ((1 << keep_bits) - 1) on a u32 pair; shifts
    and widths are static."""
    if shift_bits == 0:
        oh, ol = h, l
    elif shift_bits < 32:
        ol = (l >> U32(shift_bits)) | (h << U32(32 - shift_bits))
        oh = h >> U32(shift_bits)
    elif shift_bits == 32:
        ol, oh = h, jnp.zeros_like(h)
    else:
        ol = h >> U32(shift_bits - 32)
        oh = jnp.zeros_like(h)
    if keep_bits <= 32:
        ol = ol & U32((1 << keep_bits) - 1) if keep_bits < 32 else ol
        oh = jnp.zeros_like(oh)
    elif keep_bits < 64:
        oh = oh & U32((1 << (keep_bits - 32)) - 1)
    return oh, ol


def route_kmer_pairs(ch, cl, k: int, m: int, n_shards: int):
    """Owner shard of standalone canonical k-mers (hi, lo pairs).

    Bit-identical minimizer SELECTION to kmer_records (ops/kmer_ops.py):
    per-window min(fwd m-mer, rc m-mer), max over the k-m+1 windows, then
    route_hash % n_shards — the standalone-query form of the count step's
    placement (reference: Kmer::minimizer_hash_fast, src/kmer.cpp:349-398,
    used for routing at src/kcount/kmer_dht.cpp:193-196)."""
    rh, rl = revcomp_pairs(ch, cl, k)
    bh = bl = None
    for i in range(k - m + 1):
        # fwd window i = bases i..i+m-1 = (v >> 2(k-m-i)) & mask2m
        fh, fl = _shift_mask_pair(ch, cl, 2 * (k - m - i), 2 * m)
        # rc window i = (rc(v) >> 2i) & mask2m
        gh, gl = _shift_mask_pair(rh, rl, 2 * i, 2 * m)
        lh, ll = _pair_min(fh, fl, gh, gl)
        if bh is None:
            bh, bl = lh, ll
        else:
            take = _pair_lt(bh, bl, lh, ll)
            bh = jnp.where(take, lh, bh)
            bl = jnp.where(take, ll, bl)
    return (route_hash(bh, bl) % U32(n_shards)).astype(jnp.int32)


def _gather_multi(value_planes, idx, n_shards: int, n_local: int, cap: int):
    """values[idx] for several range-sharded planes in ONE rr_exchange:
    idx holds GLOBAL node indices; owner = idx // n_local."""
    owner = jnp.clip(idx // n_local, 0, n_shards - 1)

    def serve(mark, ridx):
        me = jax.lax.axis_index(AXIS)
        pos = jnp.clip(ridx - me * n_local, 0, n_local - 1)
        return [jnp.where(mark, v[pos], v[0]) for v in value_planes]

    return rr_exchange(
        [idx.astype(jnp.int32)], owner, n_shards, cap, serve,
        [v.dtype for v in value_planes],
    )


@dataclass(frozen=True)
class TraversalPlan:
    mesh: Mesh
    k: int
    K: int  # per-shard kmer slots
    n_shards: int
    n2p: int  # total oriented node space (= n_shards * 2K)


# ---------------------------------------------------------------------------
# generic W-word helpers (W = 2 pair planes for k <= 32, ceil(k/16) words
# for multi-word k; pair lexicographic order == value order in both layouts)
# ---------------------------------------------------------------------------


def _words_lt(a: list, b: list):
    lt = eq = None
    for aw, bw in zip(a, b):
        wlt = aw < bw
        weq = aw == bw
        if lt is None:
            lt, eq = wlt, weq
        else:
            lt = lt | (eq & wlt)
            eq = eq & weq
    return lt


def _words_eq(a: list, b: list):
    eq = None
    for aw, bw in zip(a, b):
        weq = aw == bw
        eq = weq if eq is None else eq & weq
    return eq


def _words_min(a: list, b: list):
    take_a = _words_lt(a, b)
    return [jnp.where(take_a, aw, bw) for aw, bw in zip(a, b)]


def _swap_pairs(x):
    """x[2i] <-> x[2i+1]: each oriented node's MIRROR holds exactly the
    other orientation's value, so the mirror's ov planes are the pair-swap
    of the ov planes (both key layouts)."""
    return x.reshape(-1, 2)[:, ::-1].reshape(-1)


# pointer-doubling iterations fused per device dispatch; between chunks the
# host checks convergence (see make_fin_traversal) and exits early
DOUBLE_CHUNK = 4


def make_fin_traversal(mesh: Mesh, k: int, K: int, cap: int | None = None,
                       m: int | None = None):
    """Build the PHASED device traversal (any k): FinalizedShard /
    FinalizedMW arrays -> (head, pos, *ov word planes, bc) planes
    [n_shards, 2K], globally sorted by (head, pos) with non-emitted records
    keyed to the n2p sentinel.  bc packs (last_base << 16) | count; node ids
    need n_shards*2K < 2^31.

    Returns (step, plan).  ``step`` is a HOST-DRIVING closure (VERDICT r4
    item 8): the traversal runs as seven jitted phases with the three
    pointer-doubling loops executed as DOUBLE_CHUNK-iteration device
    dispatches under host control — each chunk reports a per-shard count of
    lanes whose state changed in its last iteration, and the host stops a
    loop at the exact fixed point (state unchanged under one more iteration
    implies all further iterations are no-ops) instead of always running
    the static log2(n2p)+1 worst case.  Chains of length L converge in
    ~log2(L) rounds (typical contigs: 10-17), not 27.  Cycle rings never
    reach a p fixed point, so the label loop is additionally bounded by the
    static step count; when it DOES converge early there can be no cycles
    (every lane reached a NULL-successor terminal), so the cycle-cut and
    forward-terminal phases are skipped outright and term := p.  Phase wall
    times and round counts are slogged as the traversal decomposition.
    """
    if m is None:
        m = minimizer_len_for_k(k)
    n_shards = mesh.shape["sh"]
    n_local = 2 * K
    n2p = n_shards * n_local
    assert n2p < (1 << 31), "node space exceeds int32 ids"
    if cap is None:
        cap = max(256, 4 * n_local // n_shards)
    cap = min(cap, n_local)
    steps = max(1, int(np.ceil(np.log2(max(n2p, 2)))) + 1)
    NULL = n2p
    log2s = max(n_shards - 1, 1).bit_length() if n_shards > 1 else 0
    assert n_shards == 1 or n_shards == (1 << log2s), "power-of-two mesh"
    search_steps = max(1, (K + 1).bit_length())
    pair_mode = k <= 32

    if pair_mode:
        Wn = 2

        def rc_of(words):
            rh, rl = revcomp_pairs(words[0], words[1], k)
            return [rh, rl]

        def succ_cand(ovw, o_right):
            nh = (ovw[0] << U32(2)) | (ovw[1] >> U32(30))
            nl = (ovw[1] << U32(2)) | o_right.astype(U32)
            nh, nl = _shift_mask_pair(nh, nl, 0, 2 * k)
            return [nh, nl]

        def first_base_of(ovw):
            _, fb_l = _shift_mask_pair(ovw[0], ovw[1], 2 * (k - 1), 2)
            return fb_l.astype(jnp.int32)

        def route(cw):
            return route_kmer_pairs(cw[0], cw[1], k, m, n_shards)
    else:
        from ..ops.kmer_multiword import (
            _ext_bits,
            _rev32,
            n_words,
            route_kmer_words,
        )

        Wn = n_words(k)
        r = k - 16 * (Wn - 1)
        widths = [r] + [16] * (Wn - 1)
        offs = [0]
        for w in widths[:-1]:
            offs.append(offs[-1] + w)

        def rc_of(words):
            """Reverse complement of big-endian word stacks (bit-exact)."""
            rc_wl = [_rev32(p) for p in words]  # little-endian padded rc
            D = 32 - 2 * r
            out = []
            for o, w in zip(offs, widths):
                _, lo = _ext_bits(rc_wl, 2 * (k - o - w) + D, 2 * w)
                out.append(lo)
            return out

        def succ_cand(ovw, o_right):
            nxt = []
            for j in range(Wn):
                carry = (ovw[j + 1] >> U32(30)) if j + 1 < Wn else o_right.astype(U32)
                nxt.append((ovw[j] << U32(2)) | (carry & U32(3)))
            nxt[0] = nxt[0] & U32((1 << (2 * r)) - 1)
            return nxt

        def first_base_of(ovw):
            return ((ovw[0] >> U32(2 * (r - 1))) & U32(3)).astype(jnp.int32)

        def route(cw):
            return route_kmer_words(cw, k, n_shards, m)

    spec1 = P("sh")

    def _smap(fn, n_in, n_out, donate=()):
        mapped = jax.shard_map(
            fn, mesh=mesh, in_specs=(spec1,) * n_in, out_specs=(spec1,) * n_out,
        )
        return jax.jit(mapped, donate_argnums=donate)

    # ---- phase 1: sort + successor lookup + label init --------------------
    def ph_setup(*fin_planes):
        if pair_mode:
            keys_hi, keys_lo, counts, left, right, keep = [
                x.reshape(-1) for x in fin_planes
            ]
            kw_in = [keys_hi, keys_lo]
        else:
            keys, counts, left, right, keep = fin_planes
            kw_in = [keys.reshape(Wn, K)[j] for j in range(Wn)]
            counts, left, right, keep = [
                x.reshape(-1) for x in (counts, left, right, keep)
            ]
        me = jax.lax.axis_index(AXIS)

        # per-shard sort of kept kmers (purged -> EMPTY sentinel)
        kw = [jnp.where(keep, w, U32(EMPTY)) for w in kw_in]
        sorted_all = jax.lax.sort(tuple(kw) + (counts, left, right), num_keys=Wn)
        kw = list(sorted_all[:Wn])
        counts, left, right = sorted_all[Wn:]
        all_empty = None
        for j in range(Wn):
            e = kw[j] == U32(EMPTY)
            all_empty = e if all_empty is None else (all_empty & e)
        kvalid = ~all_empty

        # oriented node arrays [2K], shard-major global ids
        rcw = rc_of(kw)

        def il(a, b):
            return jnp.stack([a, b], axis=1).reshape(-1)

        ovw = [il(kw[j], rcw[j]) for j in range(Wn)]
        o_left = il(left, 3 - right).astype(jnp.int32)
        o_right = il(right, 3 - left).astype(jnp.int32)
        valid = il(kvalid, kvalid)
        gid = (me * n_local + jnp.arange(n_local)).astype(jnp.int32)
        first_base = first_base_of(ovw)
        last_base = (ovw[Wn - 1] & U32(3)).astype(jnp.int32)

        # successor candidate: shift one base left, append right ext
        nxt = succ_cand(ovw, o_right)
        xrc = rc_of(nxt)
        flip = _words_lt(xrc, nxt)
        cw = [jnp.where(flip, xrc[j], nxt[j]) for j in range(Wn)]

        # minimizer-routed lookup: vectorized lexicographic bsearch on the
        # owner's sorted shard
        owner = route(cw)

        def serve_lookup(mark, *rw):
            rw = list(rw)
            lo_i = jnp.zeros_like(rw[0], dtype=jnp.int32)
            hi_i = jnp.full_like(lo_i, K)
            for _ in range(search_steps):
                mid = (lo_i + hi_i) >> 1
                midc = jnp.clip(mid, 0, K - 1)
                atm = [kw[j][midc] for j in range(Wn)]
                lt = _words_lt(atm, rw) & (mid < K)
                lo_i = jnp.where(lt, mid + 1, lo_i)
                hi_i = jnp.where(lt, hi_i, mid)
            pos = jnp.clip(lo_i, 0, K - 1)
            atp = [kw[j][pos] for j in range(Wn)]
            hit = mark & _words_eq(atp, rw) & kvalid[pos]
            return [jnp.where(hit, (me * K + pos).astype(jnp.int32), -1)]

        (j,) = rr_exchange(cw, owner, n_shards, cap, serve_lookup,
                           [jnp.int32], valid=valid)
        j = jnp.where(valid, j, -1)
        exists = j >= 0
        nxt_node = jnp.where(exists, 2 * j + flip.astype(jnp.int32), 0)

        (nl_ext,) = _gather_multi([o_left], nxt_node, n_shards, n_local, cap)
        recip = exists & (nl_ext == first_base)
        not_self = nxt_node != gid
        not_mirror = nxt_node != (gid ^ 1)
        succ = jnp.where(valid & recip & not_self & not_mirror, nxt_node, NULL)

        # cycle-label init: canonical kmer value per node = min(ov, mirror ov)
        mlw = _words_min(ovw, [_swap_pairs(w) for w in ovw])
        p = jnp.where(succ == NULL, gid, succ)
        bc = ((last_base.astype(U32) & U32(3)) << U32(16)) | (
            jnp.clip(counts, 0, 65535).astype(U32)[jnp.arange(n_local) // 2]
        )
        out = tuple(ovw) + (valid, succ, bc) + tuple(mlw) + (p,)
        return tuple(x[None] for x in out)

    n_fin = 6 if pair_mode else 5
    setup = _smap(ph_setup, n_fin, 2 * Wn + 4)

    # ---- doubling chunks: DOUBLE_CHUNK iterations, report last-iteration
    # change count (fixed point iff 0 summed over shards) -------------------
    def ph_label(*args):
        mlw = list(args[:Wn])
        p = args[Wn]
        mlw = [w.reshape(-1) for w in mlw]
        p = p.reshape(-1)
        changed = jnp.zeros((), jnp.int32)
        for it in range(DOUBLE_CHUNK):
            g = _gather_multi(mlw + [p], p, n_shards, n_local, cap)
            new_ml = _words_min(mlw, g[:Wn])
            if it == DOUBLE_CHUNK - 1:
                ch = g[Wn] != p
                for j in range(Wn):
                    ch = ch | (new_ml[j] != mlw[j])
                changed = jnp.sum(ch).astype(jnp.int32)
            mlw = new_ml
            p = g[Wn]
        return tuple(w[None] for w in mlw) + (p[None], changed[None])

    label_chunk = _smap(ph_label, Wn + 1, Wn + 2, donate=tuple(range(Wn + 1)))

    def ph_fwd(p):
        p = p.reshape(-1)
        changed = jnp.zeros((), jnp.int32)
        for it in range(DOUBLE_CHUNK):
            (g_p,) = _gather_multi([p], p, n_shards, n_local, cap)
            if it == DOUBLE_CHUNK - 1:
                changed = jnp.sum(g_p != p).astype(jnp.int32)
            p = g_p
        return p[None], changed[None]

    fwd_chunk = _smap(ph_fwd, 1, 2, donate=(0,))

    def ph_pos(pos, ph_):
        pos = pos.reshape(-1)
        ph_ = ph_.reshape(-1)
        changed = jnp.zeros((), jnp.int32)
        for it in range(DOUBLE_CHUNK):
            g_pos, g_ph = _gather_multi([pos, ph_], ph_, n_shards, n_local, cap)
            if it == DOUBLE_CHUNK - 1:
                changed = jnp.sum((g_ph != ph_) | (g_pos != 0)).astype(jnp.int32)
            pos = pos + g_pos
            ph_ = g_ph
        return pos[None], ph_[None], changed[None]

    pos_chunk = _smap(ph_pos, 2, 3, donate=(0, 1))

    # ---- cycle cut (only reached when the label loop hit the static bound:
    # an early label fixed point proves every lane reached a NULL-successor
    # terminal, i.e. no cycles, no stars, nothing to cut) -------------------
    def ph_cut(succ, p, valid, *args):
        mlw = [w.reshape(-1) for w in args[:Wn]]
        ovw = [w.reshape(-1) for w in args[Wn:]]
        succ = succ.reshape(-1)
        p = p.reshape(-1)
        valid = valid.reshape(-1)
        me = jax.lax.axis_index(AXIS)
        gid = (me * n_local + jnp.arange(n_local)).astype(jnp.int32)
        (succ_at_p,) = _gather_multi([succ], p, n_shards, n_local, cap)
        in_cycle = valid & (succ_at_p != NULL)
        rcov = [_swap_pairs(w) for w in ovw]
        # star = the cycle's min canonical kmer in canonical orientation;
        # palindromic min kmer (ov == rc(ov)) ties to the even node
        star = in_cycle & _words_eq(ovw, mlw) & (
            (gid % 2 == 0) | ~_words_eq(ovw, rcov)
        )
        (star_at_succ,) = _gather_multi(
            [star.astype(jnp.int32)], jnp.where(succ == NULL, 0, succ),
            n_shards, n_local, cap,
        )
        cut = (succ != NULL) & (star_at_succ > 0)
        succ = jnp.where(cut, NULL, succ)
        p2 = jnp.where(succ == NULL, gid, succ)
        return succ[None], star[None], p2[None]

    cut_phase = _smap(ph_cut, 3 + 2 * Wn, 3,
                      donate=(0, 1) + tuple(range(3, 3 + Wn)))

    # ---- pred via push + (head, pos) init ---------------------------------
    def ph_pred(succ):
        succ = succ.reshape(-1)
        me = jax.lax.axis_index(AXIS)
        gid = (me * n_local + jnp.arange(n_local)).astype(jnp.int32)
        has = succ != NULL
        sowner = jnp.clip(succ // n_local, 0, n_shards - 1)
        my_base = me * n_local

        def apply_pred(pred, mark, flat_t, flat_f):
            locT = jnp.clip(flat_t - my_base, 0, n_local - 1)
            return pred.at[jnp.where(mark, locT, n_local)].set(
                flat_f, mode="drop"
            )

        pred = push_exchange(
            [succ, gid], sowner, has, n_shards, cap, apply_pred,
            jnp.full((n_local,), NULL, jnp.int32),
        )
        ph_ = jnp.where(pred == NULL, gid, pred)
        pos = (pred != NULL).astype(jnp.int32)
        no_star = pred != pred  # all-False plane (cycle_head when cut skipped)
        return pred[None], ph_[None], pos[None], no_star[None]

    pred_phase = _smap(ph_pred, 1, 4, donate=(0,))

    # ---- emit + local sort + block bitonic --------------------------------
    def ph_finish(pred, head_of, pos, term, cycle_head, valid, bc, *ovw):
        pred, head_of, pos, term, cycle_head, valid, bc = [
            x.reshape(-1) for x in (pred, head_of, pos, term, cycle_head, valid, bc)
        ]
        ovw = [w.reshape(-1) for w in ovw]
        me = jax.lax.axis_index(AXIS)
        gid = (me * n_local + jnp.arange(n_local)).astype(jnp.int32)
        heads = valid & (pred == NULL)
        emit = heads & jnp.where(cycle_head, True, gid <= (term ^ 1))
        (emit_at_head,) = _gather_multi(
            [emit.astype(jnp.int32)], head_of, n_shards, n_local, cap
        )
        on_emitted = valid & (emit_at_head > 0)
        key_head = jnp.where(on_emitted, head_of.astype(U32), U32(n2p))
        key_pos = jnp.where(on_emitted, pos.astype(U32), U32(0))
        planes = jax.lax.sort((key_head, key_pos) + tuple(ovw) + (bc,), num_keys=2)
        for l in range(log2s):
            for b in range(l, -1, -1):
                perm = [(i, i ^ (1 << b)) for i in range(n_shards)]
                partner = me ^ (1 << b)
                ascending = ((me >> (l + 1)) & 1) == 0
                keep_min = (me < partner) == ascending
                theirs = [jax.lax.ppermute(x, AXIS, perm) for x in planes]
                merged = jax.lax.sort(
                    tuple(jnp.concatenate([a, t]) for a, t in zip(planes, theirs)),
                    num_keys=2,
                )
                planes = tuple(
                    jnp.where(keep_min, x[:n_local], x[n_local:]) for x in merged
                )
        return tuple(x[None] for x in planes)

    finish_phase = _smap(ph_finish, 7 + Wn, Wn + 3,
                         donate=tuple(range(7 + Wn)))

    from ..parallel import distributed as dist
    from ..utils.logging import slog

    def _drive_loop(chunk_fn, state, max_iters):
        """Run chunk dispatches until the last-iteration change count sums
        to zero across shards (a fixed point), or max_iters doubling
        iterations elapse.  Returns (state, iterations, converged)."""
        it = 0
        converged = False
        while it < max_iters:
            out = chunk_fn(*state)
            state, ch = out[:-1], out[-1]
            it += DOUBLE_CHUNK
            if int(dist.fetch(ch).sum()) == 0:
                converged = True
                break
        return state, it, converged

    def step(*fin_planes):
        t = {}
        t0 = time.perf_counter()
        out = setup(*fin_planes)
        jax.block_until_ready(out)
        ovw = list(out[:Wn])
        valid, succ, bc = out[Wn:Wn + 3]
        mlw = list(out[Wn + 3:2 * Wn + 3])
        p = out[2 * Wn + 3]
        t["setup"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ml_p, label_iters, converged = _drive_loop(
            label_chunk, tuple(mlw) + (p,), steps)
        mlw, p = list(ml_p[:Wn]), ml_p[Wn]
        t["label_doubling"] = time.perf_counter() - t0

        fwd_iters = 0
        if converged:
            # label fixed point -> no cycles, no cuts; p is every lane's
            # terminal already
            term = p
            t["cycle_cut"] = 0.0
            t["fwd_doubling"] = 0.0
            cycle_head = None
        else:
            t0 = time.perf_counter()
            succ, cycle_head, p2 = cut_phase(succ, p, valid, *mlw, *ovw)
            jax.block_until_ready(succ)
            t["cycle_cut"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            (term,), fwd_iters, _ = _drive_loop(fwd_chunk, (p2,), steps)
            t["fwd_doubling"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        pred, ph_, pos, no_star = pred_phase(succ)
        jax.block_until_ready(pred)
        if cycle_head is None:
            cycle_head = no_star
        t["pred"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        (pos, ph_), pos_iters, _ = _drive_loop(pos_chunk, (pos, ph_), steps)
        t["headpos_doubling"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        planes = finish_phase(pred, ph_, pos, term, cycle_head, valid, bc, *ovw)
        jax.block_until_ready(planes)
        t["emit_sort"] = time.perf_counter() - t0

        slog(
            "traversal decomposition (s): ",
            ", ".join(f"{k_}={v:.1f}" for k_, v in t.items()),
            f"; rounds label={label_iters} fwd={fwd_iters} pos={pos_iters}",
            f" of static {steps}",
        )
        return planes

    return step, TraversalPlan(mesh, k, K, n_shards, n2p)


def make_fin_traversal_mw(mesh: Mesh, k: int, K: int, cap: int | None = None,
                          m: int | None = None):
    """Multi-word (k > 32) device traversal — same phased implementation
    (make_fin_traversal handles both key layouts)."""
    assert k > 32
    return make_fin_traversal(mesh, k, K, cap=cap, m=m)


def _device_shard_blocks(arr):
    """(global_shard_index, DEVICE-resident block) for this process's shards
    of a leading-axis-sharded array — like distributed.local_shard_items but
    without the host copy (callers chunk-fetch)."""
    for s in getattr(arr, "addressable_shards", []):
        idx = s.index[0] if s.index else slice(None)
        start = idx.start or 0
        rows = s.data.shape[0]
        for r in range(rows):
            yield start + r, s.data[r]


@dataclass
class ChainCarry:
    """Partial chain crossing a slice boundary during streamed assembly.
    Picklable (crosses process boundaries in multi-process stitching)."""

    head: int
    next_pos: int
    parts: list  # str fragments
    count_sum: int
    n: int
    has_head: bool  # saw the pos==0 record (carries the k-mer string)


_COMP_TABLE = str.maketrans("ACGT", "TGCA")


def _decode_kmer_str(ov_words, k: int) -> str:
    """Oriented k-mer string from its u32 word planes (2 pair words for
    k <= 32, W = ceil(k/16) words for multi-word k; word 0 leads)."""
    W = len(ov_words)
    if W == 2 and k <= 32:
        v = (int(ov_words[0]) << 32) | int(ov_words[1])
        widths = [k]
        vals = [v]
    else:
        r = k - 16 * (W - 1)
        widths = [r] + [16] * (W - 1)
        vals = [int(w) for w in ov_words]
    out = []
    for w, v in zip(widths, vals):
        for i in range(w):
            out.append((v >> (2 * (w - 1 - i))) & 3)
    return _BASES_BYTES[np.array(out)].tobytes().decode()


class StreamAssembler:
    """Streams (head, pos, ovh, ovl, bc) numpy slices — consumed in ascending
    global order — into contigs via sink(seq, depth).  Peak memory is one
    slice + the open chain; a chain still open when a process's slices end is
    returned by finish() as the trailing carry for cross-process stitching."""

    def __init__(self, k: int, n2p: int, sink, canonical: bool = True):
        self.k = k
        self.n2p = n2p
        self.sink = sink
        self.canonical = canonical
        self.carry: ChainCarry | None = None
        self.lead: ChainCarry | None = None  # headless first chain (partial)

    def _flush(self, c: ChainCarry):
        if not c.has_head:
            # chain started on an earlier process; hold as the lead partial
            assert self.lead is None, "more than one headless lead partial"
            self.lead = c
            return
        self.sink(*finish_chain(c, self.canonical))

    def feed(self, head, pos, ov_planes, bc):
        n2p = self.n2p
        head = np.asarray(head)
        sel = head < n2p
        if not sel.any():
            return
        head = head[sel].astype(np.int64)
        pos = np.asarray(pos)[sel].astype(np.int64)
        ov_s = [np.asarray(p)[sel] for p in ov_planes]
        bc_s = np.asarray(bc)[sel]
        bases = _BASES_BYTES[(bc_s >> 16) & 3]
        cnts = (bc_s & 0xFFFF).astype(np.int64)
        starts = np.nonzero(np.concatenate([[True], head[1:] != head[:-1]]))[0]
        carry = self.carry
        for si, b in enumerate(starts):
            e = starts[si + 1] if si + 1 < len(starts) else len(head)
            h = int(head[b])
            if carry is not None and carry.head == h:
                # continuation of the open chain
                assert int(pos[b]) == carry.next_pos, "chain slice misaligned"
                carry.parts.append(bases[b:e].tobytes().decode())
                carry.count_sum += int(cnts[b:e].sum())
                carry.n += int(e - b)
                carry.next_pos = int(pos[e - 1]) + 1
                continue
            if carry is not None:
                self._flush(carry)
            if int(pos[b]) == 0:
                kmer_str = _decode_kmer_str([p[b] for p in ov_s], self.k)
                tail = bases[b + 1 : e].tobytes().decode()
                carry = ChainCarry(h, int(pos[e - 1]) + 1, [kmer_str + tail],
                                   int(cnts[b:e].sum()), int(e - b), True)
            else:
                # chain started in an earlier slice owned by another process
                carry = ChainCarry(h, int(pos[e - 1]) + 1,
                                   [bases[b:e].tobytes().decode()],
                                   int(cnts[b:e].sum()), int(e - b), False)
        self.carry = carry

    def finish(self) -> tuple[ChainCarry | None, ChainCarry | None]:
        """Returns (lead_partial, trail_partial); chains fully inside this
        process's slices have already gone to the sink."""
        trail = self.carry
        self.carry = None
        if trail is not None and trail.has_head is False and self.lead is None:
            # entire slice range is one headless fragment
            self.lead = trail
            trail = None
        return self.lead, trail


def finish_chain(c: ChainCarry, canonical: bool = True) -> tuple[str, float]:
    seq = "".join(c.parts)
    if canonical:
        rc = seq.translate(_COMP_TABLE)[::-1]
        if rc < seq:
            seq = rc
    return seq, float(c.count_sum / c.n)


def merge_carries(a: ChainCarry | None, b: ChainCarry | None) -> ChainCarry | None:
    """Join a trailing partial with the next process's lead partial."""
    if a is None:
        return b
    if b is None:
        return a
    assert a.head == b.head, "stitched partials disagree on the chain head"
    return ChainCarry(a.head, b.next_pos, a.parts + b.parts,
                      a.count_sum + b.count_sum, a.n + b.n, a.has_head)


def contigging_device(fin, k: int, mesh: Mesh, output_dir: str, out_name: str,
                      keep_contigs: bool) -> tuple[Utgs, int, int]:
    """Full scalable contigging round: traverse the sharded finalized table on
    device, stream each process's shard slices into contigs, stitch chains
    that cross process boundaries (tiny pickled partials), and assemble the
    single rank-0 FASTA from per-run fragment files without ever holding the
    contig set in memory.

    Returns (local_utgs, n_utgs_global, total_len_global); local_utgs carries
    contigs only when keep_contigs (the --ctg-kmers carryover needs them) and
    is marked local=True (each process holds a disjoint subset).
    """
    import os

    from ..parallel import distributed as dist

    K = fin.keep.shape[-1]
    if k <= 32:
        step, plan = make_fin_traversal(mesh, k, K)
        planes = step(fin.keys_hi, fin.keys_lo, fin.counts,
                      fin.left_ext, fin.right_ext, fin.keep)
    else:
        step, plan = make_fin_traversal_mw(mesh, k, K)
        planes = step(fin.keys, fin.counts,
                      fin.left_ext, fin.right_ext, fin.keep)
    # this process's shard slices, ascending, grouped into contiguous runs;
    # blocks stay DEVICE-resident — the feed loop pulls fixed-size chunks, so
    # peak host memory is O(chunk + open chain), independent of table size
    items = [dict(_device_shard_blocks(p)) for p in planes]
    my_shards = sorted(items[0])
    runs: list[list[int]] = []
    for s in my_shards:
        if runs and runs[-1][-1] == s - 1:
            runs[-1].append(s)
        else:
            runs.append([s])
    per_rank = os.path.join(output_dir, "per_rank")
    os.makedirs(per_rank, exist_ok=True)
    local_seqs: list = []
    local_depths: list = []
    my_n = 0
    my_len = 0

    def record(f, seq, depth):
        nonlocal my_n, my_len
        f.write(f"{float(depth)!r}\t{seq}\n")
        my_n += 1
        my_len += len(seq)
        if keep_contigs:
            local_seqs.append(seq)
            local_depths.append(depth)

    partials = []  # (first_shard, last_shard, lead, trail)
    frag_paths = {}
    CHUNK = 1 << 19  # records per host fetch (5 planes x 4 B -> ~10 MB)
    n_local = 2 * K
    for run in runs:
        frag = os.path.join(per_rank, f"{out_name}.frag.{run[0]:06d}")
        frag_paths[run[0]] = frag
        with open(frag, "w") as f:
            asm = StreamAssembler(k, plan.n2p,
                                  lambda seq, depth: record(f, seq, depth))
            n_planes = len(items)
            for s in run:
                for lo in range(0, n_local, CHUNK):
                    hi = min(lo + CHUNK, n_local)
                    arrs = [np.asarray(items[i][s][lo:hi]) for i in range(n_planes)]
                    asm.feed(arrs[0], arrs[1], arrs[2:-1], arrs[-1])
            lead, trail = asm.finish()
        partials.append((run[0], run[-1], lead, trail))

    # stitch chains crossing run boundaries — every process computes the
    # identical result from the gathered (tiny) partials
    all_partials = sorted(
        (p for proc in dist.gather_objects(partials) for p in proc),
        key=lambda t: t[0],
    )
    boundary: dict[int, tuple[str, float]] = {}  # owner run -> (seq, depth)
    open_: ChainCarry | None = None
    owner_run = -1
    for first, last, lead, trail in all_partials:
        if lead is not None:
            assert open_ is not None, "headless lead with no open chain"
            open_ = merge_carries(open_, lead)
        if trail is not None:
            if open_ is not None:
                boundary[owner_run] = finish_chain(open_)
            open_, owner_run = trail, first
        elif lead is None and open_ is not None:
            # run had no continuation: the open chain ended at the boundary
            boundary[owner_run] = finish_chain(open_)
            open_, owner_run = None, -1
    if open_ is not None:
        boundary[owner_run] = finish_chain(open_)
    for first, (seq, depth) in sorted(boundary.items()):
        if first in frag_paths:
            with open(frag_paths[first], "a") as f:
                record(f, seq, depth)
    dist.barrier("contig fragments")
    if jax.process_index() == 0:
        path = os.path.join(output_dir, out_name)
        i = 0
        with open(path, "w") as out:
            for first, _, _, _ in all_partials:
                fp = os.path.join(per_rank, f"{out_name}.frag.{first:06d}")
                with open(fp) as f:
                    for line in f:
                        d, seq = line.rstrip("\n").split("\t")
                        out.write(f">uutig_{i} {float(d):.3f}\n{seq}\n")
                        i += 1
    dist.barrier("contig dump")
    for fp in frag_paths.values():
        os.remove(fp)
    return (
        Utgs(local_seqs, local_depths, local=True),
        dist.allsum(my_n),
        dist.allsum(my_len),
    )


def build_utgs_from_fin(fin, k: int, mesh: Mesh, cap: int | None = None) -> Utgs:
    """Single-controller scalable traversal: device pointer doubling + global
    bitonic (head, pos) sort, host streams one shard slice at a time."""
    K = fin.keep.shape[-1]
    if k <= 32:
        step, plan = make_fin_traversal(mesh, k, K, cap=cap)
        planes = step(fin.keys_hi, fin.keys_lo, fin.counts,
                      fin.left_ext, fin.right_ext, fin.keep)
    else:
        step, plan = make_fin_traversal_mw(mesh, k, K, cap=cap)
        planes = step(fin.keys, fin.counts,
                      fin.left_ext, fin.right_ext, fin.keep)
    seqs, depths = [], []

    def sink(seq, depth):
        seqs.append(seq)
        depths.append(depth)

    asm = StreamAssembler(k, plan.n2p, sink)
    for s in range(plan.n_shards):
        arrs = [np.asarray(x[s]) for x in planes]
        asm.feed(arrs[0], arrs[1], arrs[2:-1], arrs[-1])
    lead, trail = asm.finish()
    assert lead is None, "headless chain in single-controller assembly"
    if trail is not None:
        sink(*finish_chain(trail))
    return Utgs(seqs, depths)
