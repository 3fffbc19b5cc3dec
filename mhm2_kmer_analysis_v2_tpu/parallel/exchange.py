"""Capped, lossless collective exchange primitives (shared by the count step
and the distributed traversal).

The reference funnels every irregular communication pattern through ONE
abstraction — the destination-aggregated RPC store (ThreeTierAggrStore,
src/kcount/kmer_dht.hpp:124) with backpressure instead of drops
(src/kcount/kmer_dht.cpp:247-258), plus point RPC gets for queries
(src/kcount/kmer_dht.cpp:216-245).  This module is the TPU analogue, shared
the same way: records sort by destination ONCE, then cap-sized
per-destination windows ride successive `jax.lax.all_to_all` rounds (trip
count agreed across devices with a pmax) until every queue drains.

All helpers run INSIDE shard_map over a mesh axis named 'sh'.

  * sorted_dest   — the shared prologue (sort, per-dest column, round count)
  * round_exchange — one-way records-to-owner push feeding an insert_fn
                     (the aggregated-RPC *put* path of the count step)
  * rr_exchange    — request/response get (aggregated-RPC *get* analogue)
  * push_exchange  — one-way push with a generic per-round apply_fn
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
AXIS = "sh"


def _pvary(x):
    """Mark a device-invariant value as varying over the mesh axis (loop-carry
    type alignment).  jax.lax.pvary was deprecated in favor of pcast."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (AXIS,), to="varying")
    return jax.lax.pvary(x, (AXIS,))


def sorted_dest(target, valid, n_shards: int, cap: int, max_rounds: int = 0):
    """Shared prologue of every capped exchange: sort lanes by destination,
    compute each lane's per-destination column, and agree (pmax) on the
    number of cap-sized rounds needed to drain the fullest destination.

    Returns (order, tgt, col, rounds, lost):
      order  — argsort permutation into the sorted domain
      tgt    — sorted destinations (n_shards = invalid/padding)
      col    — per-destination column index in the sorted domain
      rounds — uniform round count (bounded by max_rounds when > 0)
      lost   — sorted-domain mask of real lanes beyond the round budget
               (all-False unless max_rounds truncates; callers turn this
               into their overflow accounting)
    """
    n = target.shape[0]
    bits = max(1, (n - 1).bit_length())
    if (n_shards + 1) < (1 << (32 - bits)):
        # single-plane u32 sort: destination in the high bits, lane index in
        # the low bits — ~2x cheaper than argsort's (key, iota) pair sort and
        # stable by construction (ties resolve by lane).  Measured: the
        # argsort was ~85 ms/batch at 618K lanes on the CPU mesh, rivaling
        # the insert itself (scripts/exp_exchange.py).
        lane = jax.lax.iota(U32, n)
        dest = jnp.where(valid, target.astype(U32), U32(n_shards))
        skey = jax.lax.sort(
            (dest << U32(bits)) | lane
        )
        order = (skey & U32((1 << bits) - 1)).astype(jnp.int32)
        tgt = (skey >> U32(bits)).astype(jnp.int32)
    else:
        key = jnp.where(valid, target.astype(jnp.int32), n_shards)
        order = jnp.argsort(key)
        tgt = key[order]
    bounds = jnp.searchsorted(tgt, jnp.arange(n_shards + 1, dtype=tgt.dtype))
    col = jnp.arange(n, dtype=jnp.int32) - bounds[
        jnp.clip(tgt, 0, n_shards - 1)
    ].astype(jnp.int32)
    max_dest = jnp.max(bounds[1:] - bounds[:-1]).astype(jnp.int32)
    rounds = jax.lax.pmax((max_dest + cap - 1) // cap, AXIS)
    if max_rounds:
        rounds = jnp.minimum(rounds, max_rounds)
    lost = (col >= rounds * cap) & (tgt < n_shards)
    return order, tgt, col, rounds, lost


def round_exchange(planes, target, valid, n_shards: int, cap: int,
                   insert_fn, carry, max_rounds: int = 0):
    """Lossless owner exchange: ship cap-sized windows per destination — one
    all_to_all per round — until every destination's queue drains.  This is
    the no-drop contract of the reference's ThreeTierAggrStore backpressure
    (src/kcount/kmer_dht.cpp:247-258) rebuilt as a collective loop.

    planes: list of [R] record planes (uint32/int32, shipped bit-cast u32).
    insert_fn(carry, *received_planes) -> carry runs per round on the
    receiver; received planes are [n_shards * cap] u32 with zero padding.
    max_rounds > 0 bounds the rounds (--max-rpcs-in-flight); only then can
    records drop, counted in the returned overflow.

    Returns (carry, spill_rounds, overflow) — spill_rounds = rounds - 1.
    """
    nplanes = len(planes)
    order, tgt, col, rounds, lost = sorted_dest(
        target, valid, n_shards, cap, max_rounds
    )
    sp = [p[order].astype(U32) for p in planes]
    overflow = jnp.sum(lost).astype(jnp.int32)

    def body(r, carry):
        in_range = (col >= r * cap) & (col < (r + 1) * cap) & (tgt < n_shards)
        row = jnp.where(in_range, tgt, n_shards)
        ccol = jnp.clip(col - r * cap, 0, cap - 1)
        buf = jnp.zeros((n_shards, nplanes, cap), U32)
        for p_i, p in enumerate(sp):
            buf = buf.at[row, p_i, ccol].set(p, mode="drop")
        buf = jax.lax.all_to_all(buf, AXIS, 0, 0, tiled=True)
        received = [buf[:, p_i, :].reshape(-1) for p_i in range(nplanes)]
        return insert_fn(carry, *received)

    carry = jax.lax.fori_loop(0, rounds, body, carry)
    return carry, jnp.maximum(rounds - 1, 0).astype(jnp.int32), overflow


def rr_exchange(planes, owner, n_shards: int, cap: int, serve_fn, out_dtypes,
                valid=None):
    """Capped request/response exchange (aggregated-RPC *get* analogue,
    src/kcount/kmer_dht.cpp:216-245).

    planes: list of [Q] request planes.  serve_fn(mark, *received) -> list of
    reply planes ([n_shards*cap] each, dtypes = out_dtypes); `mark` flags real
    request slots.  Returns [Q]-aligned reply arrays (invalid lanes zero).
    """
    Q = owner.shape[0]
    if valid is None:
        valid = jnp.ones((Q,), bool)
    order, tgt, col, rounds, _ = sorted_dest(owner, valid, n_shards, cap)
    sp = [p[order] for p in planes]
    # fresh zeros are device-invariant; mark them varying over the mesh axis
    # so the loop carry type matches the per-device body outputs
    outs = tuple(_pvary(jnp.zeros((Q,), dt)) for dt in out_dtypes)

    def body(r, outs):
        in_r = (col >= r * cap) & (col < (r + 1) * cap) & (tgt < n_shards)
        row = jnp.where(in_r, tgt, n_shards)
        ccol = jnp.clip(col - r * cap, 0, cap - 1)
        mark = jnp.zeros((n_shards, cap), bool).at[row, ccol].set(in_r, mode="drop")
        mark = jax.lax.all_to_all(mark, AXIS, 0, 0, tiled=True)
        recv = []
        for p in sp:
            buf = jnp.zeros((n_shards, cap), p.dtype).at[row, ccol].set(p, mode="drop")
            recv.append(jax.lax.all_to_all(buf, AXIS, 0, 0, tiled=True).reshape(-1))
        replies = serve_fn(mark.reshape(-1), *recv)
        new_outs = []
        for out, rep in zip(outs, replies):
            back = jax.lax.all_to_all(rep.reshape(n_shards, cap), AXIS, 0, 0, tiled=True)
            flat = back[jnp.clip(tgt, 0, n_shards - 1), ccol]
            # reply for sorted-slot q lands back at original position order[q]
            new_outs.append(out.at[jnp.where(in_r, order, Q)].set(
                jnp.where(in_r, flat, 0), mode="drop"
            ))
        return tuple(new_outs)

    return list(jax.lax.fori_loop(0, rounds, body, outs))


def push_exchange(planes, owner, valid, n_shards: int, cap: int, apply_fn, carry):
    """Capped one-way exchange (aggregated-RPC *put* analogue):
    carry = apply_fn(carry, mark, *received) per round."""
    order, tgt, col, rounds, _ = sorted_dest(owner, valid, n_shards, cap)
    sp = [p[order] for p in planes]
    carry = jax.tree.map(_pvary, carry)

    def body(r, carry):
        in_r = (col >= r * cap) & (col < (r + 1) * cap) & (tgt < n_shards)
        row = jnp.where(in_r, tgt, n_shards)
        ccol = jnp.clip(col - r * cap, 0, cap - 1)
        mark = jnp.zeros((n_shards, cap), bool).at[row, ccol].set(in_r, mode="drop")
        mark = jax.lax.all_to_all(mark, AXIS, 0, 0, tiled=True)
        recv = []
        for p in sp:
            buf = jnp.zeros((n_shards, cap), p.dtype).at[row, ccol].set(p, mode="drop")
            recv.append(jax.lax.all_to_all(buf, AXIS, 0, 0, tiled=True).reshape(-1))
        return apply_fn(carry, mark.reshape(-1), *recv)

    return jax.lax.fori_loop(0, rounds, body, carry)
