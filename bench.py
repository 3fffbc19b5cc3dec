"""Benchmark: k-mer counting throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (round 5+, VERDICT r4 item 3): counted k-mers/s through the
full device hot path (canonical extraction + vectorized hash insert) with
the table PRE-STAGED TO 0.58 LOAD — the 1.2 GB reference-scale run's real
end load (BASELINE.md), i.e. the number that actually gates end-to-end
time.  Side fields keep the r1-r4-comparable ~25%-load scan
(value_low_load_scan) and add the --use-qf loaded variant (value_qf).
vs_baseline is relative to the reference's only published kernel throughput
number: the point_tcf GPU filter's claimed 1.3e9 inserts/s
(point_tcf/README.md:44, see BASELINE.md).
"""

import json
import time

import numpy as np


def make_reads(rng, genome, n_reads, read_len):
    """Coverage-style reads over one genome (realistic table load factor)."""
    genome_len = len(genome)
    starts = rng.integers(0, genome_len - read_len + 1, n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    codes = genome[idx]
    # ~0.5% base error like BASE_ERROR_RATE
    err = rng.random((n_reads, read_len)) < 0.005
    codes = np.where(err, (codes + rng.integers(1, 4, codes.shape)) % 4, codes).astype(np.uint8)
    badq = rng.random((n_reads, read_len)) < 0.02
    lengths = np.full(n_reads, read_len, np.int32)
    return codes, badq, lengths


def _wait_for_backend(max_attempts: int = 10):
    """Re-exec until a jax backend initializes (the tunneled TPU pool drops
    out occasionally; jax caches a failed backend init in-process, so retry
    means a fresh process — keeps the round-end bench from recording nothing
    when the pool is briefly down)."""
    import os
    import sys

    import jax

    try:
        return jax.devices()
    except RuntimeError as e:
        attempt = int(os.environ.get("MHM2_BENCH_ATTEMPT", "0"))
        if attempt + 1 >= max_attempts:
            raise
        print(f"# backend unavailable ({e}); retry {attempt + 1} in 60s", flush=True)
        time.sleep(60)
        os.environ["MHM2_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import jax
    import jax.numpy as jnp

    from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import kmer_records
    from mhm2_kmer_analysis_v2_tpu.table import shard_table
    from mhm2_kmer_analysis_v2_tpu.utils.compcache import enable_compilation_cache

    _wait_for_backend()

    enable_compilation_cache()  # fresh-process reruns skip the remote compile

    k = 21
    read_len = 150
    batch_reads = 8192
    n_batches = 10
    rng = np.random.default_rng(42)

    # ~10M-element table (well under one v5e chip's HBM)
    table = shard_table.create(10_000_000)

    def one(table, batch):
        codes, badq, lengths = batch
        recs = kmer_records(codes, badq, lengths, k=k, n_shards=1)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        table = shard_table.insert_batch(
            table,
            flat["canon_hi"],
            flat["canon_lo"],
            flat["left"],
            flat["right"],
            jnp.ones_like(flat["left"]),
            flat["valid"],
            full_hi_range=k >= 32,
        )
        return table, 0

    @jax.jit
    def run_all(table, codes, badq, lengths):
        table, _ = jax.lax.scan(one, table, (codes, badq, lengths))
        return table

    # coverage-style reads from one synthetic metagenome (~2M unique k-mers,
    # ~25% table load — the operating point the sizing heuristics target)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    batches = [make_reads(rng, genome, batch_reads, read_len) for _ in range(n_batches)]
    codes = jnp.asarray(np.stack([b[0] for b in batches]))
    badq = jnp.asarray(np.stack([b[1] for b in batches]))
    lengths = jnp.asarray(np.stack([b[2] for b in batches]))

    # warmup / compile (also absorbs the one-time device-grant claim)
    table = run_all(table, codes, badq, lengths)
    np.asarray(table.num_dropped)

    t0 = time.perf_counter()
    table = run_all(table, codes, badq, lengths)
    np.asarray(table.num_dropped)  # force full sync
    elapsed = time.perf_counter() - t0

    total_kmers = n_batches * batch_reads * (read_len - k - 1)
    kmers_per_sec = total_kmers / elapsed

    # second measurement: the REAL operating point (VERDICT r3 weak #1) —
    # the 1.2 GB chip run ends at 0.581 load (BASELINE.md), so stage the
    # table to ~0.58 with random distinct keys and time the same read
    # batches through the loaded-tier insert program the pipeline switches
    # to past 0.15 occupancy (shard_table.insert_batch high_load=True)
    def one_loaded(table, batch):
        codes, badq, lengths = batch
        recs = kmer_records(codes, badq, lengths, k=k, n_shards=1)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        table = shard_table.insert_batch(
            table, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], jnp.ones_like(flat["left"]), flat["valid"],
            full_hi_range=k >= 32, high_load=True)
        return table, 0

    @jax.jit
    def run_loaded(table, codes, badq, lengths):
        table, _ = jax.lax.scan(one_loaded, table, (codes, badq, lengths))
        return table

    @jax.jit
    def stage(table, hi, lo):
        e = jnp.zeros_like(hi, jnp.uint8)
        return shard_table.insert_batch(
            table, hi, lo, e, e, jnp.ones_like(e), jnp.ones_like(hi, bool),
            full_hi_range=True, high_load=True)

    table2 = shard_table.create(10_000_000)
    target = int(table2.capacity * 0.58)
    keys = rng.integers(0, 1 << 63, target, np.uint64)  # distinct whp
    for off in range(0, target, 2_000_000):  # short dispatches (tunnel kill)
        chunk = keys[off:off + 2_000_000]
        table2 = stage(table2, jnp.asarray((chunk >> np.uint64(32)).astype(np.uint32)),
                       jnp.asarray((chunk & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        np.asarray(table2.num_dropped)
    table2 = run_loaded(table2, codes[:2], badq[:2], lengths[:2])  # warm compile
    np.asarray(table2.num_dropped)
    t0 = time.perf_counter()
    table2 = run_loaded(table2, codes, badq, lengths)
    np.asarray(table2.num_dropped)
    elapsed_loaded = time.perf_counter() - t0
    kmers_per_sec_loaded = total_kmers / elapsed_loaded

    # third measurement: --use-qf at the same 0.58 main-table load.  The
    # filter+main pair is staged by running the distinct staging keys
    # through the QF insert twice (first pass stores each key in the
    # filter, the second promotes it to main — the real promotion path),
    # then the same read batches are timed through insert_batch_qf.
    from mhm2_kmer_analysis_v2_tpu.table import singleton_filter as sf

    def one_qf(carry, batch):
        codes, badq, lengths = batch
        recs = kmer_records(codes, badq, lengths, k=k, n_shards=1)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        tbl, flt = carry
        tbl, flt = sf.insert_batch_qf(
            tbl, flt, flat["canon_hi"], flat["canon_lo"], flat["left"],
            flat["right"], jnp.ones_like(flat["left"]), flat["valid"],
            high_load=True)
        return (tbl, flt), 0

    @jax.jit
    def run_qf(tbl, flt, codes, badq, lengths):
        (tbl, flt), _ = jax.lax.scan(one_qf, (tbl, flt), (codes, badq, lengths))
        return tbl, flt

    @jax.jit
    def stage_qf(tbl, flt, hi, lo):
        e = jnp.zeros_like(hi, jnp.uint8)
        return sf.insert_batch_qf(
            tbl, flt, hi, lo, e, e, jnp.ones_like(e), jnp.ones_like(hi, bool),
            high_load=True)

    table3 = shard_table.create(10_000_000)
    filt = sf.create_filter(10_000_000)
    for _pass in range(2):  # pass 1 -> filter, pass 2 -> promote to main
        for off in range(0, target, 2_000_000):
            chunk = keys[off:off + 2_000_000]
            table3, filt = stage_qf(
                table3, filt,
                jnp.asarray((chunk >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray((chunk & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
            np.asarray(table3.num_dropped)
    table3, filt = run_qf(table3, filt, codes[:2], badq[:2], lengths[:2])
    np.asarray(table3.num_dropped)
    t0 = time.perf_counter()
    table3, filt = run_qf(table3, filt, codes, badq, lengths)
    np.asarray(table3.num_dropped)
    kmers_per_sec_qf = total_kmers / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "kmer_count_throughput_per_chip_at_0.58_load",
                "value": round(kmers_per_sec_loaded, 1),
                "unit": "kmers/s",
                "vs_baseline": round(kmers_per_sec_loaded / 1.3e9, 4),
                "value_low_load_scan": round(kmers_per_sec, 1),
                "value_qf": round(kmers_per_sec_qf, 1),
                "note": "value: kernel with table pre-staged to the 1.2GB "
                        "run's real 0.58 end load (loaded-tier program); "
                        "value_low_load_scan: the r1-r4-comparable ~25%-load "
                        "scan; value_qf: --use-qf filter+main at the same "
                        "staged load",
            }
        )
    )


if __name__ == "__main__":
    main()
