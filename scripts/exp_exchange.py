#!/usr/bin/env python3
"""Attribute the sharded exchange's per-lane overhead (VERDICT r3 weak #3).

BENCH_SCALING_r3 showed n=2 (in-core) per-device throughput at 0.28x the n=1
bypass.  This decomposes one record-wire count step on an n-device mesh into
cumulative variants (each adds one piece of the machinery):

  extract      kmer_records only (shared prologue)
  insert_local extract + local insert at R lanes        == the n=1 bypass
  sort         extract + sorted_dest (argsort + column)
  route        extract + full round_exchange, fold-only insert_fn
               (adds the per-round scatter + all_to_all)
  full         extract + round_exchange + real insert   == the shipped step
               (the receiver inserts n_shards*cap lanes per round, so cap
               directly multiplies insert work — measured at 4x-mean and
               1.25x-mean caps)

Run on the virtual CPU mesh:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/exp_exchange.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads-per-device", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("-k", type=int, default=21)
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import kmer_records
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs
    from mhm2_kmer_analysis_v2_tpu.parallel import exchange
    from mhm2_kmer_analysis_v2_tpu.table import shard_table

    k = args.k
    L = args.read_len
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    devs = jax.devices()
    elems = 4_000_000

    def build_variant(mesh, n, variant, cap):
        def extract(codes, badq, lengths):
            recs = kmer_records(codes, badq, lengths, k=k, n_shards=n)
            return {kk: v.reshape(-1) for kk, v in recs.items()}

        def per_device(state, codes, badq, lengths):
            flat = extract(codes, badq, lengths)
            cnt = jnp.ones_like(flat["left"])
            meta = cs._pack_meta(flat["left"], flat["right"], cnt, flat["valid"])
            local = cs._local_table(state)
            if variant == "extract":
                # data-dependent fold so XLA cannot DCE the extraction
                local = local._replace(
                    num_dropped=local.num_dropped
                    + (jnp.sum(meta.astype(jnp.int32)) % 2))
            elif variant == "insert_local":
                local = cs._insert_from_buffers(
                    local, flat["canon_hi"], flat["canon_lo"], meta, k)
            elif variant == "sort":
                order, tgt, col, rounds, lost = exchange.sorted_dest(
                    flat["target"], flat["valid"], n, cap)
                s = (jnp.sum(col) + jnp.sum(tgt) + rounds
                     + jnp.sum(order)).astype(jnp.int32)
                local = local._replace(num_dropped=local.num_dropped + s % 2)
            elif variant == "route":
                def fold(c, rhi, rlo, rmeta):
                    return (c + jnp.sum((rmeta != 0).astype(jnp.int32))).astype(jnp.int32)
                c, spill, ov = exchange.round_exchange(
                    [flat["canon_hi"], flat["canon_lo"], meta], flat["target"],
                    flat["valid"], n, cap, fold,
                    exchange._pvary(jnp.zeros((), jnp.int32)), 0)
                local = local._replace(num_dropped=local.num_dropped + c % 2)
            elif variant == "full":
                def ins(tbl, rhi, rlo, rmeta):
                    return cs._insert_from_buffers(
                        tbl, rhi, rlo, rmeta.astype(jnp.int32), k)
                local, spill, ov = exchange.round_exchange(
                    [flat["canon_hi"], flat["canon_lo"], meta], flat["target"],
                    flat["valid"], n, cap, ins, local, 0)
            return state._replace(
                keys_hi=local.keys_hi[None], keys_lo=local.keys_lo[None],
                counts=local.counts[None], extc=local.extc[None],
                claim=local.claim[None], num_dropped=local.num_dropped[None])

        mapped = jax.shard_map(
            per_device, mesh=mesh,
            in_specs=(cs._STATE_SPEC, P("sh", None), P("sh", None), P("sh")),
            out_specs=cs._STATE_SPEC)
        import functools
        return jax.jit(mapped, donate_argnums=(0,))

    for n in args.sizes:
        if n > len(devs):
            continue
        mesh = Mesh(np.array(devs[:n]), ("sh",))
        sharding = NamedSharding(mesh, P("sh"))
        B = args.reads_per_device * n
        mean = args.reads_per_device * L // n
        caps = {"cap4": 4 * mean + 4096, "cap125": int(1.25 * mean) + 1024}
        batches = []
        for _ in range(args.batches):
            starts = rng.integers(0, 2_000_000 - L + 1, B)
            codes = genome[starts[:, None] + np.arange(L)[None, :]]
            batches.append((
                jax.device_put(codes, sharding),
                jax.device_put(np.zeros((B, L), bool), sharding),
                jax.device_put(np.full(B, L, np.int32), sharding)))
        kmers = args.batches * B * (L - k - 1)
        plan = [("extract", "cap4"), ("insert_local", "cap4"),
                ("sort", "cap4"), ("route", "cap4"), ("full", "cap4")]
        if n > 1:
            plan += [("route", "cap125"), ("full", "cap125")]
        for variant, capname in plan:
            step = build_variant(mesh, n, variant, caps[capname])
            best = float("inf")
            spills = 0
            for _ in range(args.trials):
                state = cs.create_sharded(n, elems // n + 4096, mesh=mesh)
                state = step(state, *batches[0])
                np.asarray(state.num_dropped)
                t0 = time.perf_counter()
                for b in batches:
                    state = step(state, *b)
                np.asarray(state.num_dropped)
                best = min(best, time.perf_counter() - t0)
                spills = int(np.asarray(state.spill_rounds).max())
            rec = {"devices": n, "variant": variant, "cap": capname,
                   "cap_lanes": caps[capname],
                   "kmers_per_sec": round(kmers / best, 1),
                   "per_device": round(kmers / best / n, 1),
                   "ms_per_batch": round(1000 * best / args.batches, 2),
                   "spill_rounds": spills}
            print(json.dumps(rec), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
