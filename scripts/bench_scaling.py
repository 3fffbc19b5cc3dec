#!/usr/bin/env python3
"""Weak-scaling harness (BASELINE config #5): sharded counting throughput at
1..N devices, fixed work per device.

On a multi-chip slice this measures real ICI all_to_all scaling; on one chip
or the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates the sharded
path and reports per-config throughput + the >=85%% efficiency target.

Methodology (r3, after the r2 numbers proved irreproducible): each device
count times `--trials` repeats of the same compiled program over the same
staged batches and reports the BEST (min-time) trial — on a shared, noisy
host the min is the only stable statistic.  Both wires measure the n=1
baseline with the identical record-wire program, so their baselines cannot
diverge.  Physical core count is recorded: on a virtual mesh with more
devices than cores, per-device throughput beyond the core count is
host-core-bound by construction (efficiency is reported against the largest
device count that still fits the cores, and raw vs-1 as well).
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads-per-device", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("-k", type=int, default=21)
    ap.add_argument("--supermers", action="store_true",
                    help="bench the supermer-compressed wire")
    ap.add_argument("--out", default="", help="append JSON results to this file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mhm2_kmer_analysis_v2_tpu.parallel import count_step as cs

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    devs = jax.devices()
    cores = os.cpu_count() or 1
    results = []
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= len(devs)]
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), ("sh",))
        B = args.reads_per_device * n
        L = args.read_len
        mean = args.reads_per_device * L // n
        cap = mean + mean // 4 + 1024  # 1.25x-mean, like the pipeline
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
        best = float("inf")
        for _ in range(args.trials):
            # fresh table per trial: identical program + identical load
            state = cs.create_sharded(n, 4_000_000 // n + 4096, mesh=mesh)
            state = step(state, *batches[0])  # compile on trial 1; warm after
            np.asarray(state.num_dropped)
            t0 = time.perf_counter()
            for b in batches:
                state = step(state, *b)
            np.asarray(state.num_dropped)
            best = min(best, time.perf_counter() - t0)
        kmers = args.batches * B * (L - args.k - 1)
        thr = kmers / best
        results.append({"devices": n, "kmers_per_sec": round(thr, 1),
                        "per_device": round(thr / n, 1),
                        "best_of": args.trials,
                        "wire": "supermer" if (args.supermers and n > 1) else "record"})
        print(json.dumps(results[-1]))
    if len(results) > 1:
        eff_vs_1 = results[-1]["per_device"] / results[0]["per_device"]
        # efficiency against the largest in-core config (virtual meshes
        # oversubscribe the host beyond the physical core count)
        in_core = [r for r in results if r["devices"] <= cores]
        base = in_core[-1] if in_core else results[0]
        eff = results[-1]["per_device"] / base["per_device"]
        results.append({
            "weak_scaling_efficiency_vs_1": round(eff_vs_1, 3),
            "weak_scaling_efficiency_vs_incore": round(eff, 3),
            "incore_base_devices": base["devices"],
            "physical_cores": cores,
            "target": 0.85,
        })
        print(json.dumps(results[-1]))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({"config": vars(args), "results": results}) + "\n")


if __name__ == "__main__":
    main()
