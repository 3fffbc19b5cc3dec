#!/usr/bin/env python3
"""Traversal decomposition bench (VERDICT r4 item 8).

Builds a synthetic finalized table of many short UU chains (the realistic
contig-length regime: the r3 1.2 GB run averaged ~60 bp/uutig) directly as
FinalizedShard arrays, then times the device traversal on the virtual CPU
mesh.  Compare HEAD (fused static-steps traversal) against the phased
early-exit traversal by running this script on each revision:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/exp_traversal.py [--n-ctg 50000] [--len 130]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ctg", type=int, default=50_000)
    ap.add_argument("--len", type=int, default=130, dest="ctg_len")
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--devices", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from mhm2_kmer_analysis_v2_tpu.contig import device as cdev
    from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import (
        kmer_records,
        minimizer_len_for_k,
        pairs_to_u64,
    )

    k = args.k
    devs = jax.devices()
    if args.devices:
        devs = devs[: args.devices]
    mesh = Mesh(devs, ("sh",))
    n_shards = len(devs)
    EMPTY = 0xFFFFFFFF

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, (args.n_ctg, args.ctg_len), dtype=np.int8)
    rec = kmer_records(
        jnp.asarray(codes.astype(np.int32)),
        jnp.zeros(codes.shape, bool),
        jnp.full((args.n_ctg,), args.ctg_len, jnp.int32),
        k=k, n_shards=1,
    )
    valid = np.asarray(rec["valid"]).reshape(-1)
    hi = np.asarray(rec["canon_hi"]).reshape(-1)[valid]
    lo = np.asarray(rec["canon_lo"]).reshape(-1)[valid]
    left = np.asarray(rec["left"]).reshape(-1)[valid]
    right = np.asarray(rec["right"]).reshape(-1)[valid]
    vals = np.asarray(pairs_to_u64(jnp.asarray(hi), jnp.asarray(lo)))
    _, first = np.unique(vals, return_index=True)
    hi, lo, left, right = hi[first], lo[first], left[first], right[first]
    n = len(hi)
    counts = np.full((n,), 2, np.int32)
    # terminal kmers whose flank ext was invalid would be purged in a real
    # finalize; keep only called-ext records like the pipeline does
    keepm = (left < 4) & (right < 4)
    hi, lo, left, right, counts = [a[keepm] for a in (hi, lo, left, right, counts)]
    n = len(hi)

    m = minimizer_len_for_k(k)
    owner = np.asarray(
        cdev.route_kmer_pairs(jnp.asarray(hi), jnp.asarray(lo), k, m, n_shards)
    )
    order = np.argsort(owner, kind="stable")
    per = np.bincount(owner, minlength=n_shards)
    starts = np.concatenate([[0], np.cumsum(per)[:-1]])
    col = np.arange(n) - starts[owner[order]]
    K = int(per.max()) + 1
    shp = (n_shards, K)
    f_hi = np.full(shp, EMPTY, np.uint32)
    f_lo = np.full(shp, EMPTY, np.uint32)
    f_c = np.zeros(shp, np.int32)
    f_l = np.zeros(shp, np.int32)
    f_r = np.zeros(shp, np.int32)
    f_k = np.zeros(shp, bool)
    rows = owner[order]
    f_hi[rows, col] = hi[order]
    f_lo[rows, col] = lo[order]
    f_c[rows, col] = counts[order]
    f_l[rows, col] = left[order]
    f_r[rows, col] = right[order]
    f_k[rows, col] = True

    class Fin:
        keys_hi = jnp.asarray(f_hi)
        keys_lo = jnp.asarray(f_lo)
        counts = jnp.asarray(f_c)
        left_ext = jnp.asarray(f_l)
        right_ext = jnp.asarray(f_r)
        keep = jnp.asarray(f_k)

    print(f"# {n} kmers, {args.n_ctg} chains, K={K}, n2p={n_shards * 2 * K}",
          flush=True)
    t0 = time.perf_counter()
    utgs = cdev.build_utgs_from_fin(Fin, k, mesh)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    utgs = cdev.build_utgs_from_fin(Fin, k, mesh)
    hot = time.perf_counter() - t0
    print(json.dumps({
        "n_kmers": n, "n_contigs_out": len(utgs.seqs),
        "total_len": sum(len(s) for s in utgs.seqs),
        "warm_s": round(warm, 2), "hot_s": round(hot, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
