#!/usr/bin/env python3
"""Extended randomized parity sweep (opt-in; the in-suite fuzz is a subset).

Usage: python scripts/fuzz_extended.py [n_trials] [base_seed]
Runs end-to-end count+finalize+UTG parity against the oracle across random
dataset shapes and k values; prints one line per failure, summary at the end.
"""

import os
import sys

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mhm2_kmer_analysis_v2_tpu import oracle
from mhm2_kmer_analysis_v2_tpu.io.packed_reads import encode_batch
from mhm2_kmer_analysis_v2_tpu.ops import kmer_ops, kmer_multiword as mw
from mhm2_kmer_analysis_v2_tpu.table import shard_table, shard_table_mw as stmw, singleton_filter as sf
from mhm2_kmer_analysis_v2_tpu.contig import utg
from mhm2_kmer_analysis_v2_tpu.oracle import OracleCounter


def one_trial(seed: int) -> list:
    errors = []
    rng = np.random.default_rng(seed)
    k = int(rng.choice([15, 17, 19, 21, 23, 27, 31, 32, 33, 39, 45, 55, 63, 64, 96, 128, 160]))
    glen = int(rng.integers(120, 900))
    genome = "".join(rng.choice(list("ACGT"), glen))
    n_reads = int(rng.integers(20, 120))
    reads = []
    for _ in range(n_reads):
        L = int(rng.integers(k + 2, min(3 * k + 40, glen)))
        if rng.random() < 0.85:
            p = int(rng.integers(0, glen - L + 1))
            s = list(genome[p : p + L])
        else:
            s = list(rng.choice(list("ACGT"), L))
        for i in range(L):
            r = rng.random()
            if r < 0.01:
                s[i] = "N"
            elif r < 0.02:
                s[i] = "ACGT"[int(rng.integers(4))]
        q = "".join(chr(33 + int(x)) for x in rng.integers(0, 42, L))
        reads.append(("".join(s), q))

    oc = OracleCounter(k)
    for s, q in reads:
        oc.add_read(s, q)
    exp = oc.finalize()

    b = encode_batch([s for s, _ in reads], [q for _, q in reads])
    use_qf = bool(rng.integers(0, 2))  # half the trials run the QF mode
    if k <= 32:
        recs = kmer_ops.kmer_records(
            jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
            k=k, m=min(15, k), n_shards=1)
        fl = {kk: v.reshape(-1) for kk, v in recs.items()}
        table = shard_table.create(1 << 15)
        one = jnp.ones_like(fl["left"])
        if use_qf:
            filt = sf.create_filter(1 << 13)
            table, _ = sf.insert_batch_qf(
                table, filt, fl["canon_hi"], fl["canon_lo"], fl["left"],
                fl["right"], one, fl["valid"])
        else:
            table = shard_table.insert_batch(
                table, fl["canon_hi"], fl["canon_lo"], fl["left"], fl["right"],
                one, fl["valid"])
        fin = shard_table.finalize(table)
        vals, counts, left, right = shard_table.compact_to_host(fin)
        strs = shard_table.vals_to_strings(vals, k)
    else:
        recs = mw.kmer_records_mw(
            jnp.asarray(b.codes), jnp.asarray(b.badq), jnp.asarray(b.lengths),
            k=k, n_shards=1)
        Wn = mw.n_words(k)
        words = recs["canon"].reshape(Wn, -1)
        table = stmw.create(1 << 15, Wn)
        one = jnp.ones_like(recs["left"].reshape(-1))
        if use_qf:
            filt = sf.create_filter(1 << 13)
            table, _ = sf.insert_batch_qf_mw(
                table, filt, words, recs["left"].reshape(-1),
                recs["right"].reshape(-1), one, recs["valid"].reshape(-1))
        else:
            table = stmw.insert_batch_mw(
                table, words, recs["left"].reshape(-1), recs["right"].reshape(-1),
                one, recs["valid"].reshape(-1))
        finm = stmw.finalize_mw(table)
        strs, counts, left, right = stmw.compact_to_host_mw(finm, k)
    got = {s: (int(c), l, r) for s, c, l, r in zip(strs, counts, left, right)}
    if got != exp:
        errors.append(f"seed={seed} k={k} qf={use_qf}: count table mismatch "
                      f"({len(got)} vs {len(exp)} entries)")
        return errors

    # UTG parity
    items = sorted(exp.items())
    sstrs = [s for s, _ in items]
    cnts = [v[0] for _, v in items]
    ls = [v[1] for _, v in items]
    rs = [v[2] for _, v in items]
    exp_utg = oc.utgs()
    got_mwu = utg.build_utgs_mw(sstrs, cnts, ls, rs, k)
    canon = {min(s, oracle.revcomp_str(s)) for s in got_mwu.seqs}
    if canon != exp_utg:
        errors.append(f"seed={seed} k={k}: UTG mismatch")
    return errors


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    failures = []
    for t in range(n):
        errs = one_trial(base + t)
        for e in errs:
            print("FAIL:", e, flush=True)
        failures += errs
        if (t + 1) % 10 == 0:
            print(f"[{t+1}/{n}] {len(failures)} failures", flush=True)
    print(f"done: {n} trials, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
