#!/usr/bin/env python3
"""Count-kernel protocol experiments on the real chip (VERDICT r2 item 10).

One process (one TPU grant), several configs; prints one JSON line each:
  - R sweep: batch_reads in {8192, 16384, 32768} at fixed total work — does a
    larger batch amortize any remaining per-step overhead?
  - primitive re-measure at the chosen R to tighten the speed-of-light model.

Run: `python scripts/exp_count_kernel.py` (env as-is, real TPU).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import kmer_records
    from mhm2_kmer_analysis_v2_tpu.table import shard_table
    from mhm2_kmer_analysis_v2_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    k = 21
    read_len = 150
    total_reads = 81920
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)

    def bench_R(batch_reads, trials=3):
        n_batches = total_reads // batch_reads
        batches = [make_reads(rng, genome, batch_reads, read_len)
                   for _ in range(n_batches)]
        codes = jnp.asarray(np.stack([b[0] for b in batches]))
        badq = jnp.asarray(np.stack([b[1] for b in batches]))
        lengths = jnp.asarray(np.stack([b[2] for b in batches]))

        def one(table, batch):
            c, b, l = batch
            recs = kmer_records(c, b, l, k=k, n_shards=1)
            flat = {kk: v.reshape(-1) for kk, v in recs.items()}
            table = shard_table.insert_batch(
                table, flat["canon_hi"], flat["canon_lo"], flat["left"],
                flat["right"], jnp.ones_like(flat["left"]), flat["valid"],
            )
            return table, 0

        @jax.jit
        def run_all(table, codes, badq, lengths):
            table, _ = jax.lax.scan(one, table, (codes, badq, lengths))
            return table

        table0 = shard_table.create(10_000_000)
        table = run_all(table0, codes, badq, lengths)
        np.asarray(table.num_dropped)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            table = run_all(table, codes, badq, lengths)
            np.asarray(table.num_dropped)
            best = min(best, time.perf_counter() - t0)
        total_kmers = n_batches * batch_reads * (read_len - k - 1)
        print(json.dumps({
            "metric": f"count_throughput_R{batch_reads}",
            "value": round(total_kmers / best, 1),
            "unit": "kmers/s",
            "batches": n_batches,
        }), flush=True)
        return total_kmers / best

    for R in (8192, 16384, 32768):
        bench_R(R)

    # ---- primitive costs at R = 1.2M lanes (floor-model re-measure) -------
    R = 8192 * 150
    cap = 15_485_867
    tbl = jnp.zeros((cap,), jnp.int32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, cap, R), jnp.int32)
    val = jnp.ones((R,), jnp.int32)

    def timeit(name, fn, *args):
        o = jax.jit(fn)(*args)
        jax.tree.map(lambda x: x.block_until_ready(), o)
        np.asarray(jax.tree.leaves(o)[0][:1])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            o = jax.jit(fn)(*args)
            np.asarray(jax.tree.leaves(o)[0][:1])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"metric": f"prim_{name}", "value": round(best * 1e3, 2),
                          "unit": "ms"}), flush=True)

    timeit("gather", lambda t, i: t[i], tbl, idx)
    timeit("scatter_set", lambda t, i, v: t.at[i].set(v), tbl, idx, val)
    timeit("scatter_add", lambda t, i, v: t.at[i].add(v), tbl, idx, val)
    timeit("sort_u32", lambda i: jax.lax.sort(i), idx)
    timeit("elementwise", lambda i: (i * 3 + 1) ^ (i >> 2), idx)


if __name__ == "__main__":
    main()
