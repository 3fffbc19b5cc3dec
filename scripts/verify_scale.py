#!/usr/bin/env python
"""Independent verification of a pipeline run with the vectorized fast oracle.

Feeds the run's post-merge read checkpoint (--dump-merged output — exactly
the read stream the counting stage consumed) to FastOracleCounter and
compares against the run's recorded results:

  * unique k-mer count and total count sum (proxy_results_summary.csv), and
  * if the run used --dump-kmers, the full per-rank kmers-<k>.txt.gz dump
    (every k-mer's count and called L/R extensions).

This closes the "parity was only checked at toy scale" gap: the fast oracle
handles reference-benchmark scale (tens of millions of unique k-mers) in
minutes on the host, with semantics fuzz-locked to the scalar spec oracle
(tests/test_oracle_fast.py).

Usage: python scripts/verify_scale.py <run_dir> -k 21
"""

import argparse
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("-k", type=int, default=21)
    ap.add_argument("--qual-offset", type=int, default=33)
    ap.add_argument("--dmin-thres", type=int, default=2)
    args = ap.parse_args()

    from mhm2_kmer_analysis_v2_tpu.oracle import val_to_kmer
    from mhm2_kmer_analysis_v2_tpu.oracle_fast import FastOracleCounter

    merged = sorted(glob.glob(os.path.join(args.run_dir, "*-merged.fastq.gz")))
    if not merged:
        sys.exit(f"no *-merged.fastq.gz in {args.run_dir}; rerun with --dump-merged")

    fo = FastOracleCounter(args.k, qual_offset=args.qual_offset,
                           dmin_thres=args.dmin_thres)
    for fn in merged:
        print(f"reading {fn} ...")
        fo.add_fastq(fn)
    vals, counts, lch, rch = fo.finalize_arrays()
    if vals.ndim == 2:  # k > 32: (hi, lo) word pairs
        vals = (vals[:, 0].astype(object) << 64) | vals[:, 1].astype(object)
    uniq, total = len(vals), int(counts.sum())
    print(f"fast oracle: unique={uniq} total_count_sum={total}")

    failures = 0

    csv = os.path.join(args.run_dir, "proxy_results_summary.csv")
    if os.path.exists(csv):
        hdr, row = open(csv).read().splitlines()[:2]
        rec = dict(zip(hdr.split(","), row.split(",")))
        got_u, got_t = int(rec["Unique kmers"]), int(rec["Total kmers"])
        ok = (got_u, got_t) == (uniq, total)
        failures += not ok
        print(f"csv: unique={got_u} total={got_t} -> {'OK' if ok else 'MISMATCH'}")
    else:
        print("csv: not found (skipped)")

    dumps = sorted(glob.glob(os.path.join(
        args.run_dir, "per_rank", f"kmers-{args.k}.txt.gz*")))
    if dumps:
        got = {}
        for fn in dumps:
            with gzip.open(fn, "rt") as f:
                for ln in f:
                    kmer, cnt, l, r = ln.split()
                    got[kmer] = (int(cnt), l, r)
        exp_n = len(vals)
        ok = len(got) == exp_n
        bad = 0
        for v, c, l, r in zip(vals, counts, lch, rch):
            e = got.get(val_to_kmer(int(v), args.k))
            if e != (int(c), chr(l), chr(r)):
                bad += 1
                if bad <= 3:
                    print(f"  dump mismatch {val_to_kmer(int(v), args.k)}: "
                          f"run={e} oracle=({int(c)},{chr(l)},{chr(r)})")
        ok = ok and bad == 0
        failures += not ok
        print(f"dump: {len(got)} kmers vs {exp_n} expected, {bad} mismatched "
              f"-> {'OK' if ok else 'MISMATCH'}")
    else:
        print("dump: not found (skipped)")

    if failures:
        sys.exit(f"FAIL: {failures} comparison(s) mismatched")
    print("PASS: run output matches the fast oracle")


if __name__ == "__main__":
    main()
