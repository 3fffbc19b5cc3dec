#!/usr/bin/env python3
"""Decompose the chip-scale count-stage gap (VERDICT r3 weak #1).

The r3 headline bench measured 7.66M kmers/s on a 15.2M-slot table at ~25%
end load, scan-fused 10 batches per dispatch; the real 1.2 GB chip run's
count stage ran 0.45M kmers/s on a 117M-slot table ending at 0.581 load,
one dispatch per batch.  This experiment isolates each axis on the real
chip with the SAME insert kernel (`shard_table.insert_batch`):

  axis 1  dispatch: lax.scan over 10 batches in one jit  vs  10 donated
          per-batch dispatches
  axis 2  capacity: 10M elems (15.2M slots, the bench)  vs  77.2M elems
          (117M slots, the clamped chip run)
  axis 3  load: fresh table (~13% end load)  vs  prefilled to 0.55 with
          random canonical keys (the run's 0.581 end state)
  axis 4  h2d: inputs pre-staged (all configs) + a separate measurement of
          one packed batch's device_put (the per-batch feed cost)

Prints one JSON line per config; run single-process (claims the TPU grant).
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import kmer_records
    from mhm2_kmer_analysis_v2_tpu.table import shard_table
    from mhm2_kmer_analysis_v2_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    print(f"# backend: {jax.default_backend()} {jax.devices()}", flush=True)

    smoke = "--smoke" in sys.argv  # CPU validation: tiny caps, same code paths
    k = 21
    read_len = 150
    batch_reads = 512 if smoke else 8192
    n_batches = 3 if smoke else 10
    cap_small = 50_000 if smoke else 10_000_000
    cap_big = 200_000 if smoke else 77_200_000
    rng = np.random.default_rng(42)

    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    batches = [make_reads(rng, genome, batch_reads, read_len) for _ in range(n_batches)]
    codes = jnp.asarray(np.stack([b[0] for b in batches]))
    badq = jnp.asarray(np.stack([b[1] for b in batches]))
    lengths = jnp.asarray(np.stack([b[2] for b in batches]))
    total_kmers = n_batches * batch_reads * (read_len - k - 1)

    def make_runners(hl):
        def one(table, batch):
            bcodes, bbadq, blengths = batch
            recs = kmer_records(bcodes, bbadq, blengths, k=k, n_shards=1)
            flat = {kk: v.reshape(-1) for kk, v in recs.items()}
            table = shard_table.insert_batch(
                table, flat["canon_hi"], flat["canon_lo"], flat["left"],
                flat["right"], jnp.ones_like(flat["left"]), flat["valid"],
                full_hi_range=False, high_load=hl,
            )
            return table, 0

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_scan(table, codes, badq, lengths):
            table, _ = jax.lax.scan(one, table, (codes, badq, lengths))
            return table

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_one(table, bcodes, bbadq, blengths):
            table, _ = one(table, (bcodes, bbadq, blengths))
            return table

        return run_scan, run_one

    runners = {hl: make_runners(hl) for hl in (False, True)}

    # prefill: R random canonical keys per scan step (k=21: hi 10 bits)
    R_fill = batch_reads * read_len

    @functools.partial(jax.jit, donate_argnums=(0,))
    def prefill_chunk(table, key):
        def body(carry, _):
            table, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            hi = jax.random.randint(k1, (R_fill,), 0, 1 << 10, jnp.uint32)
            lo = jax.random.bits(k2, (R_fill,), jnp.uint32)
            z = jnp.zeros((R_fill,), jnp.int32)
            table = shard_table.insert_batch(
                table, hi, lo, z, z, jnp.ones((R_fill,), jnp.int32),
                jnp.ones((R_fill,), bool), full_hi_range=False,
                high_load=True)
            return (table, key), 0
        (table, _), _ = jax.lax.scan(body, (table, key), None, length=4)
        return table

    def prefill(table, key, steps: int):
        # chunked dispatches (a single 50+-step fused scan crashed the
        # tunneled TPU worker); 4 inserts per dispatch, donated carry
        import jax as _jax
        for i in range(-(-steps // 4)):
            key, sub = _jax.random.split(key)
            table = prefill_chunk(table, sub)
        return table

    def fresh(cap_elems):
        return shard_table.create(cap_elems)

    def measure(label, table, mode, hl=False):
        run_scan, run_one = runners[hl]
        # warmup pass (compile) on a THROWAWAY table copy is impossible with
        # donation; compile on the real table, then measure a second pass —
        # matches bench.py's protocol (the table keeps the warmup contents,
        # which IS the operating point: genome kmers present, load as labeled)
        if mode == "scan":
            table = run_scan(table, codes, badq, lengths)
            np.asarray(table.num_dropped)
            t0 = time.perf_counter()
            table = run_scan(table, codes, badq, lengths)
            np.asarray(table.num_dropped)
            dt = time.perf_counter() - t0
        else:
            for i in range(n_batches):
                table = run_one(table, codes[i], badq[i], lengths[i])
            np.asarray(table.num_dropped)
            t0 = time.perf_counter()
            for i in range(n_batches):
                table = run_one(table, codes[i], badq[i], lengths[i])
            np.asarray(table.num_dropped)
            dt = time.perf_counter() - t0
        st = shard_table.probe_stats_device(table.keys_hi[None], table.keys_lo[None])
        print(json.dumps({
            "config": label, "mode": mode, "high_load_prog": hl,
            "kmers_per_s": round(total_kmers / dt, 1),
            "ms_per_batch": round(1000 * dt / n_batches, 1),
            "end_load": round(float(st["load_factor"][0]), 4),
            "avg_probe": round(float(st["avg_probe"][0]), 2),
            "max_probe": int(st["max_probe"][0]),
            "dropped": int(np.asarray(table.num_dropped)),
        }), flush=True)
        del table

    key = jax.random.key(7)
    # warmup+measure passes add the genome uniques + error singletons
    warm_keys = 2_600_000 if not smoke else 0

    # --- bench capacity: the VERDICT load sweep (25/45/58/66% end load) -----
    # loaded configs run PERBATCH: a scan-of-10 at load is a 60s+ single
    # dispatch, which trips the tunneled worker's watchdog (two observed
    # "TPU worker process crashed" kills, both on long dispatches)
    for mode in ("scan", "perbatch"):
        measure("bench_cap_fresh", fresh(cap_small), mode)

    cap_b = shard_table.next_prime(int(cap_small / 0.66))
    for target in (0.45, 0.58, 0.66):
        steps = max(0, int((target * cap_b - warm_keys) / R_fill))
        for hl in ((False, True) if target != 0.45 else (True,)):
            t = prefill(fresh(cap_small), key, steps)
            np.asarray(t.num_dropped)
            measure(f"bench_cap_load{int(target*100)}", t, "perbatch", hl)

    # --- chip capacity (77.2M elems = 117M slots) at the real end load ------
    measure("chip_cap_fresh", fresh(cap_big), "perbatch")
    cap_c = shard_table.next_prime(int(cap_big / 0.66))
    steps_c = max(0, int((0.58 * cap_c - warm_keys) / R_fill))
    t0 = time.perf_counter()
    t = prefill(fresh(cap_big), key, steps_c)
    np.asarray(t.num_dropped)
    print(f"# chip-cap prefill {steps_c} steps: {time.perf_counter()-t0:.1f}s",
          flush=True)
    measure("chip_cap_load58", t, "perbatch", hl=True)
    t = prefill(fresh(cap_big), key, steps_c)
    np.asarray(t.num_dropped)
    measure("chip_cap_load58", t, "perbatch", hl=False)

    # --- h2d: one packed batch's worth of bytes (0.5 B/base + masks) --------
    pb_bytes = batch_reads * read_len // 2 + 2 * batch_reads * read_len // 8
    buf = np.zeros((pb_bytes,), np.uint8)
    for _ in range(2):
        t0 = time.perf_counter()
        arr = jax.device_put(buf)
        jax.block_until_ready(arr)
        dt = time.perf_counter() - t0
    print(json.dumps({
        "config": "h2d_packed", "bytes": pb_bytes,
        "mb_per_s": round(pb_bytes / dt / 1e6, 2),
        "s_per_batch": round(dt, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
