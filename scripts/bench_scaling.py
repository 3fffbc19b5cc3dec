#!/usr/bin/env python3
"""Weak-scaling harness (BASELINE config #5): sharded counting throughput at
1..N devices, fixed work per device.

On a multi-chip slice this measures real ICI all_to_all scaling; on one chip
or the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates the sharded
path and reports per-config throughput + the >=85%% efficiency target.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads-per-device", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("-k", type=int, default=21)
    ap.add_argument("--supermers", action="store_true",
                    help="bench the supermer-compressed wire (the pipeline default)")
    ap.add_argument("--out", default="", help="append JSON results to this file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    devs = jax.devices()
    results = []
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= len(devs)]
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), ("sh",))
        B = args.reads_per_device * n
        L = args.read_len
        state = cs.create_sharded(n, 4_000_000 // n + 4096, mesh=mesh)
        cap = (args.reads_per_device * L // n) * 4 + 4096
        if args.supermers and n > 1:
            sm_cap = max((args.reads_per_device * L) // (n * 3) + 1024, 1024)
            step = cs.make_count_step_supermer(mesh, k=args.k, exchange_cap=sm_cap)
        else:
            step = cs.make_count_step(mesh, k=args.k, exchange_cap=cap)
        sharding = NamedSharding(mesh, P("sh"))
        batches = []
        for _ in range(args.batches):
            starts = rng.integers(0, 2_000_000 - L + 1, B)
            codes = genome[starts[:, None] + np.arange(L)[None, :]]
            batches.append((
                jax.device_put(codes, sharding),
                jax.device_put(np.zeros((B, L), bool), sharding),
                jax.device_put(np.full(B, L, np.int32), sharding),
            ))
        state = step(state, *batches[0])
        np.asarray(state.num_dropped)
        t0 = time.perf_counter()
        for b in batches:
            state = step(state, *b)
        np.asarray(state.num_dropped)
        dt = time.perf_counter() - t0
        kmers = args.batches * B * (L - args.k - 1)
        thr = kmers / dt
        results.append({"devices": n, "kmers_per_sec": round(thr, 1),
                        "per_device": round(thr / n, 1),
                        "wire": "supermer" if (args.supermers and n > 1) else "record"})
        print(json.dumps(results[-1]))
    if len(results) > 1:
        eff = results[-1]["per_device"] / results[0]["per_device"]
        results.append({"weak_scaling_efficiency": round(eff, 3), "target": 0.85})
        print(json.dumps(results[-1]))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({"config": vars(args), "results": results}) + "\n")


if __name__ == "__main__":
    main()
