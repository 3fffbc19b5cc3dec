"""Distributed UU-tig traversal: pointer doubling over a sharded node space.

The single-device builders (utg.build_utgs / build_utgs_device) assume the
whole oriented-node array fits one chip.  Here the node space is range-sharded
over the mesh axis 'sh' and every pointer-doubling round resolves its jumps
with a request/response exchange: requests sort by owner shard, ride one
all_to_all, gather locally, and ride a second all_to_all home — the
collective analogue of the reference's aggregated RPC gets, turning the
O(log N) doubling rounds into O(log N) all_to_all pairs over ICI/DCN.

Exchange buffers are CAPPED per destination: requests ship in cap-sized
windows over spill rounds (uniform trip count via pmax, like the count
exchange), so per-round memory is O(n_local + cap * n_shards) instead of
O(n_shards * n_local) — pointer doubling concentrates queries onto terminal
owners, which would otherwise force the full quadratic buffer.

Demonstrated on the virtual CPU mesh (tests); the formulation is
device-count-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hostmem import host_empty, host_full
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# shared with the count step's owner exchange (parallel/exchange.py): one
# capped-spill-round abstraction, like the reference's single
# ThreeTierAggrStore behind both puts and gets
from ..parallel.exchange import push_exchange as _push_exchange
from ..parallel.exchange import rr_exchange as _rr_exchange
from .utg import Utgs, _assemble


def _dist_gather(values, idx, n_shards: int, n_local: int, cap: int):
    """values[idx] where `values` is the local slice of a range-sharded global
    array and `idx` holds GLOBAL indices.  Runs inside shard_map."""
    owner = jnp.clip(idx // n_local, 0, n_shards - 1)

    def serve(mark, ridx):
        my_base = jax.lax.axis_index("sh") * n_local
        local_pos = jnp.clip(ridx - my_base, 0, n_local - 1)
        return [jnp.where(mark, values[local_pos], values[0])]

    (out,) = _rr_exchange(
        [idx.astype(jnp.int32)], owner, n_shards, cap, serve, [values.dtype]
    )
    return out


def build_utgs_sharded(vals: np.ndarray, counts: np.ndarray, left_code: np.ndarray,
                       right_code: np.ndarray, k: int, mesh: Mesh,
                       cap: int | None = None) -> Utgs:
    """Unitig construction with every doubling round as collective exchanges.

    vals must be globally sorted (the compact table is); node space =
    2*N oriented nodes range-sharded over the mesh.  `cap` bounds every
    exchange's per-destination buffer (default: generous for small meshes,
    4x the uniform share + 256 otherwise).
    """
    N = len(vals)
    if N == 0:
        return Utgs([], [])
    n_shards = mesh.shape["sh"]
    n2 = 2 * N
    pad = (-n2) % (n_shards * 2)
    n2p = n2 + pad
    n_local = n2p // n_shards
    steps = max(1, int(np.ceil(np.log2(max(n2p, 2)))) + 1)
    if cap is None:
        cap = max(256, 4 * n_local // n_shards)
    cap = min(cap, n_local)

    # shard boundaries for the distributed searchsorted (replicated, small)
    Np = n2p // 2
    kmer_bounds = host_empty(n_shards, np.uint64)
    for s in range(n_shards):
        first_kmer = (s * n_local) // 2
        if first_kmer >= N:
            # shard holds only padding: sentinel above every real canonical
            # k-mer (canonical = min(v, rc(v)) can never be all-ones), so
            # searchsorted never routes a real query here
            kmer_bounds[s] = np.uint64(0xFFFFFFFFFFFFFFFF)
        else:
            kmer_bounds[s] = vals[first_kmer]

    vals_p = host_full(Np, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    vals_p[:N] = vals
    lc = np.zeros(Np, np.int64)
    rc_ = np.zeros(Np, np.int64)
    lc[:N] = left_code
    rc_[:N] = right_code
    cnts = np.zeros(Np, np.int64)
    cnts[:N] = counts

    mask = (1 << (2 * k)) - 1
    top_shift = 2 * (k - 1)

    def rc_vals_np(v):
        out = np.zeros_like(v)
        vv = v.copy()
        for _ in range(k):
            out = (out << np.uint64(2)) | (np.uint64(3) - (vv & np.uint64(3)))
            vv >>= np.uint64(2)
        return out

    rcv = rc_vals_np(vals_p)
    # oriented arrays (interleaved), padded region self-looping
    ov = host_empty(n2p, np.uint64)
    ov[0::2] = vals_p
    ov[1::2] = rcv
    o_left = host_empty(n2p, np.int64)
    o_right = host_empty(n2p, np.int64)
    o_left[0::2] = lc
    o_left[1::2] = 3 - rc_
    o_right[0::2] = rc_
    o_right[1::2] = 3 - lc
    node_valid = np.zeros(n2p, bool)
    node_valid[: 2 * N] = True

    from ..parallel.distributed import fetch, put_global

    sharding = NamedSharding(mesh, P("sh"))
    rep = NamedSharding(mesh, P())

    def shard2d(x):
        return put_global(np.asarray(x).reshape(n_shards, n_local), sharding)

    NULL = n2p

    @jax.jit
    def run(ovs, o_lefts, o_rights, valids, kb):
        def per_device(ov, o_left, o_right, valid, kmer_bounds):
            ov = ov.reshape(-1)
            o_left = o_left.reshape(-1)
            o_right = o_right.reshape(-1)
            valid = valid.reshape(-1)
            me = jax.lax.axis_index("sh")
            gid = me * n_local + jnp.arange(n_local)

            # successor candidate
            nxt_val = ((ov << jnp.uint64(2)) | o_right.astype(jnp.uint64)) & jnp.uint64(mask)
            out = jnp.zeros_like(nxt_val)
            vv = nxt_val
            for _ in range(k):
                out = (out << jnp.uint64(2)) | (jnp.uint64(3) - (vv & jnp.uint64(3)))
                vv = vv >> jnp.uint64(2)
            nxt_rc = out
            nxt_canon = jnp.minimum(nxt_val, nxt_rc)
            nxt_s = (nxt_rc < nxt_val).astype(jnp.int32)
            # distributed searchsorted: owner by boundary, then remote lookup.
            # Send the query VALUE; owner answers with global kmer index or -1.
            owner_guess = jnp.clip(
                jnp.searchsorted(kmer_bounds, nxt_canon, side="right") - 1, 0, n_shards - 1
            )
            my_kmers = ov.reshape(-1, 2)[:, 0]  # [n_local//2]
            my_kvalid = valid.reshape(-1, 2)[:, 0]

            def serve_lookup(mark, req):
                pos = jnp.clip(
                    jnp.searchsorted(my_kmers, req), 0, n_local // 2 - 1
                )
                hit = mark & (my_kmers[pos] == req) & my_kvalid[pos]
                my_kbase = me * (n_local // 2)
                return [jnp.where(hit, (my_kbase + pos).astype(jnp.int32), -1)]

            (j,) = _rr_exchange(
                [nxt_canon], owner_guess, n_shards, cap, serve_lookup,
                [jnp.int32], valid=valid,
            )
            j = jnp.where(valid, j, -1)

            exists = j >= 0
            nxt_node = jnp.where(exists, 2 * j + nxt_s, 0)
            first_base = (ov >> jnp.uint64(top_shift)).astype(jnp.int32)
            # reciprocity: gather next's oriented left ext remotely
            nl = _dist_gather(o_left.astype(jnp.int32), nxt_node, n_shards, n_local, cap)
            recip = exists & (nl == first_base)
            not_self = nxt_node != gid
            not_mirror = nxt_node != (gid ^ 1)
            succ = jnp.where(
                valid & recip & not_self & not_mirror, nxt_node, NULL
            )

            # cycle breaking
            p = jnp.where(succ == NULL, gid, succ)
            ml = jnp.minimum(gid, p)
            for _ in range(steps):
                ml = jnp.minimum(ml, _dist_gather(ml, p, n_shards, n_local, cap))
                p = _dist_gather(p, p, n_shards, n_local, cap)
            succ_at_p = _dist_gather(succ, p, n_shards, n_local, cap)
            in_cycle = succ_at_p != NULL
            cut = in_cycle & (succ == ml)
            # mark cycle heads: push a flag to each cut edge's target owner
            tgt = jnp.where(cut, succ, NULL)
            towner = jnp.clip(tgt // n_local, 0, n_shards - 1)
            my_base = me * n_local

            def apply_cut(cycle_head, mark, flat):
                loc = jnp.clip(flat - my_base, 0, n_local - 1)
                return cycle_head.at[jnp.where(mark, loc, n_local)].set(
                    True, mode="drop"
                )

            cycle_head = _push_exchange(
                [tgt.astype(jnp.int32)], towner, cut, n_shards, cap,
                apply_cut, jnp.zeros((n_local,), bool),
            )
            succ = jnp.where(cut, NULL, succ)

            # forward doubling: terminal
            p = jnp.where(succ == NULL, gid, succ)
            for _ in range(steps):
                p = _dist_gather(p, p, n_shards, n_local, cap)
            term = p
            # pred via the same push exchange
            has = succ != NULL
            sowner = jnp.clip(succ // n_local, 0, n_shards - 1)

            def apply_pred(pred, mark, flat_t, flat_f):
                locT = jnp.clip(flat_t - my_base, 0, n_local - 1)
                return pred.at[jnp.where(mark, locT, n_local)].set(
                    flat_f, mode="drop"
                )

            pred = _push_exchange(
                [succ.astype(jnp.int32), gid.astype(jnp.int32)], sowner, has,
                n_shards, cap, apply_pred, jnp.full((n_local,), NULL, jnp.int32),
            )

            ph = jnp.where(pred == NULL, gid, pred.astype(succ.dtype))
            pos_d = (pred != NULL).astype(jnp.int64)
            for _ in range(steps):
                pos_d = pos_d + _dist_gather(pos_d, ph, n_shards, n_local, cap)
                ph = _dist_gather(ph, ph, n_shards, n_local, cap)
            head_of = ph
            heads = pred == NULL
            mt = term ^ 1
            emit = valid & heads & jnp.where(cycle_head, gid % 2 == 0, gid <= mt)
            last_base = (ov & jnp.uint64(3)).astype(jnp.int32)
            return (
                ov[None], last_base[None], head_of[None], pos_d[None], emit[None]
            )

        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("sh"), P("sh"), P("sh"), P("sh"), P(None)),
            out_specs=(P("sh"), P("sh"), P("sh"), P("sh"), P("sh")),
        )(ovs, o_lefts, o_rights, valids, kb)

    ovs = shard2d(ov)
    o_lefts = shard2d(o_left)
    o_rights = shard2d(o_right)
    valids = shard2d(node_valid)
    kb = put_global(np.asarray(kmer_bounds), rep)
    r_ov, r_last, r_head, r_pos, r_emit = run(ovs, o_lefts, o_rights, valids, kb)

    counts2 = np.zeros(Np, np.int64)
    counts2[:N] = counts
    return _assemble(
        fetch(r_ov).reshape(-1),
        fetch(r_last).reshape(-1),
        fetch(r_head).reshape(-1).astype(np.int64),
        fetch(r_pos).reshape(-1),
        fetch(r_emit).reshape(-1),
        counts2, k,
    )
