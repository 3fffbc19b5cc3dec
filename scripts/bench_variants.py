"""Single-chip throughput for the non-headline table paths: multi-word
(k=33) and the --use-qf singleton-filter insert.

Run with the env as-is (real TPU): `python scripts/bench_variants.py`.
Prints one JSON line per variant; results recorded in BASELINE.md.  The
headline k=21 path is bench.py (the driver contract).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_reads  # noqa: E402  (same synthetic workload)


def main():
    import jax
    import jax.numpy as jnp

    from mhm2_kmer_analysis_v2_tpu.ops.kmer_multiword import kmer_records_mw
    from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import kmer_records
    from mhm2_kmer_analysis_v2_tpu.table import shard_table, shard_table_mw
    from mhm2_kmer_analysis_v2_tpu.table.singleton_filter import (
        create_filter,
        insert_batch_qf,
    )
    from mhm2_kmer_analysis_v2_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    read_len = 150
    batch_reads = 8192
    n_batches = 10
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, 2_000_000, dtype=np.uint8)
    batches = [make_reads(rng, genome, batch_reads, read_len) for _ in range(n_batches)]
    codes = jnp.asarray(np.stack([b[0] for b in batches]))
    badq = jnp.asarray(np.stack([b[1] for b in batches]))
    lengths = jnp.asarray(np.stack([b[2] for b in batches]))

    def bench(name, k, init_state, step):
        @jax.jit
        def run_all(state, codes, badq, lengths):
            state, _ = jax.lax.scan(step, state, (codes, badq, lengths))
            return state

        def force(s):
            # block_until_ready returns early on the tunneled backend; an
            # actual D2H fetch of a scalar is the reliable sync (bench.py
            # does the same with np.asarray(table.num_dropped))
            leaf = min(jax.tree.leaves(s), key=lambda a: a.size)
            np.asarray(leaf)

        state = run_all(init_state, codes, badq, lengths)  # warmup/compile
        force(state)
        t0 = time.perf_counter()
        state = run_all(state, codes, badq, lengths)
        force(state)
        elapsed = time.perf_counter() - t0
        total = n_batches * batch_reads * (read_len - k - 1)
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(total / elapsed, 1),
                    "unit": "kmers/s",
                }
            ),
            flush=True,
        )

    # ---- multi-word (3 words at k=33; 8 words at the reference's
    # MAX_BUILD_KMER=128 default) ------------------------------------------
    from mhm2_kmer_analysis_v2_tpu.ops.kmer_multiword import n_words

    def make_step_mw(k_mw):
        def step_mw(table, batch):
            codes, badq, lengths = batch
            recs = kmer_records_mw(codes, badq, lengths, k=k_mw, n_shards=1)
            W = recs["canon"].shape[0]
            words = recs["canon"].reshape(W, -1)
            flat = {kk: v.reshape(-1) for kk, v in recs.items() if kk != "canon"}
            table = shard_table_mw.insert_batch_mw(
                table, words, flat["left"], flat["right"],
                jnp.ones_like(flat["left"]), flat["valid"],
                w0_full_range=(k_mw % 16 == 0),
            )
            return table, 0

        return step_mw

    for k_mw in (33, 128):
        bench(
            f"kmer_count_throughput_mw_k{k_mw}",
            k_mw,
            shard_table_mw.create(10_000_000, n_words(k_mw)),
            make_step_mw(k_mw),
        )

    # ---- --use-qf (singleton filter in front of the k=21 table) -----------
    k_qf = 21

    def step_qf(state, batch):
        table, filt = state
        codes, badq, lengths = batch
        recs = kmer_records(codes, badq, lengths, k=k_qf, n_shards=1)
        flat = {kk: v.reshape(-1) for kk, v in recs.items()}
        table, filt = insert_batch_qf(
            table, filt, flat["canon_hi"], flat["canon_lo"],
            flat["left"], flat["right"],
            jnp.ones_like(flat["left"]), flat["valid"],
        )
        return (table, filt), 0

    bench(
        "kmer_count_throughput_qf_k21",
        k_qf,
        (shard_table.create(10_000_000), create_filter(12_000_000)),
        step_qf,
    )


if __name__ == "__main__":
    main()
