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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_used_qf(run_dir: str) -> bool:
    import json

    cfg = os.path.join(run_dir, "mhm2.config")
    if not os.path.exists(cfg):
        return False
    try:
        return bool(json.load(open(cfg)).get("use_qf", False))
    except ValueError:
        return False


def _run_scalars(run_dir: str, k: int):
    """(unique, total) the run recorded for round k: the round-<k>-result.json
    sidecar when present, else the proxy_results_summary.csv row whose
    position matches k's index in the run config's kmer_lens (the CSV has one
    row per round, in kmer_lens order, with no k column)."""
    import json

    sidecar = os.path.join(run_dir, f"round-{k}-result.json")
    if os.path.exists(sidecar):
        d = json.load(open(sidecar))
        return int(d["unique_kmers"]), int(d["total_kmer_count_sum"])
    csv = os.path.join(run_dir, "proxy_results_summary.csv")
    if not os.path.exists(csv):
        return None
    lines = open(csv).read().splitlines()
    if len(lines) < 2:
        return None
    hdr, rows = lines[0].split(","), lines[1:]
    idx = 0
    cfg = os.path.join(run_dir, "mhm2.config")
    if os.path.exists(cfg):
        klens = json.load(open(cfg)).get("kmer_lens", [])
        if k in klens:
            idx = klens.index(k)
        elif len(rows) > 1:
            print(f"warning: k={k} not in run config kmer_lens {klens}; "
                  "using the first CSV row")
    if idx >= len(rows):
        return None
    rec = dict(zip(hdr, rows[idx].split(",")))
    return int(rec["Unique kmers"]), int(rec["Total kmers"])


def _load_fasta(path: str) -> list:
    """(seq, depth_float) pairs from a uutigs-<k>.fasta."""
    out = []
    depth = 0.0
    seq_parts: list = []
    with open(path) as f:
        for ln in f:
            if ln.startswith(">"):
                if seq_parts:
                    out.append(("".join(seq_parts), depth))
                    seq_parts = []
                depth = float(ln.split()[1])
            else:
                seq_parts.append(ln.strip())
    if seq_parts:
        out.append(("".join(seq_parts), depth))
    return out


def _prev_round_k(run_dir: str, k: int):
    """The k of the round preceding `k` in the run's kmer_lens, or None."""
    import json

    cfg = os.path.join(run_dir, "mhm2.config")
    if not os.path.exists(cfg):
        return None, False
    d = json.load(open(cfg))
    klens = d.get("kmer_lens", [])
    use_ctg = bool(d.get("ctg_kmers", False))
    if k in klens and klens.index(k) > 0:
        return klens[klens.index(k) - 1], use_ctg
    return None, use_ctg


def _check_contigs(run_dir: str, k: int, vals, counts, lch, rch) -> int:
    """Rebuild UU-tigs from the fast oracle's finalized arrays with the host
    pointer-doubling builder and compare the (canonical seq, depth) multiset
    against the run's uutigs-<k>.fasta (VERDICT r3 item 7: traversal parity
    at scale, exact — both engines emit min(seq, revcomp))."""
    from mhm2_kmer_analysis_v2_tpu.contig.utg import build_utgs, build_utgs_mw
    from mhm2_kmer_analysis_v2_tpu.oracle_fast import words_to_base_matrix

    path = os.path.join(run_dir, f"uutigs-{k}.fasta")
    if not os.path.exists(path):
        print("contigs: uutigs fasta not found (skipped)")
        return 0
    lut = {ord("A"): 0, ord("C"): 1, ord("G"): 2, ord("T"): 3}
    if vals.ndim == 1:
        lcode = np.array([lut[b] for b in lch], np.int64)
        rcode = np.array([lut[b] for b in rch], np.int64)
        utgs = build_utgs(vals, counts, lcode, rcode, k)
    else:
        mat = words_to_base_matrix(vals, k)
        utgs = build_utgs_mw(mat, counts, np.asarray(lch), np.asarray(rch), k)
    from collections import Counter

    want = Counter((s, f"{d:.3f}") for s, d in zip(utgs.seqs, utgs.depths))
    got = Counter((s, f"{d:.3f}") for s, d in _load_fasta(path))
    if want == got:
        print(f"contigs: {sum(got.values())} uutigs match the oracle-rebuilt "
              "traversal (seq+depth multiset) -> OK")
        return 0
    only_run = got - want
    only_oracle = want - got
    print(f"contigs: MISMATCH — run has {sum(only_run.values())} uutigs the "
          f"oracle rebuild lacks; oracle has {sum(only_oracle.values())} the "
          "run lacks; examples:")
    for s, d in list(only_run)[:2]:
        print(f"  run-only: depth={d} len={len(s)} {s[:60]}...")
    for s, d in list(only_oracle)[:2]:
        print(f"  oracle-only: depth={d} len={len(s)} {s[:60]}...")
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("-k", type=int, default=21)
    ap.add_argument("--qual-offset", type=int, default=33)
    ap.add_argument("--dmin-thres", type=int, default=2)
    ap.add_argument("--no-contigs", action="store_true",
                    help="skip the uutig traversal-parity check")
    ap.add_argument("--allow-recorded-drops", action="store_true",
                    help="tolerate record-level differences bounded by the "
                    "round sidecar's num_dropped (HBM-clamp overflow runs: "
                    "each dropped insert perturbs exactly one kmer record — "
                    "its own count/ext — so missing+mismatched+run-only "
                    "records must be <= num_dropped; scalars are then checked "
                    "for consistency with the dump itself, and the contig "
                    "check is skipped since drops legitimately break chains)")
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
    # multi-k --ctg-kmers rounds seed from the previous round's contigs;
    # replay them (oracle.add_ctg_seq semantics, vectorized) so every round
    # of a multi-k run verifies, not just the first (VERDICT r3 item 2)
    prev_k, use_ctg = _prev_round_k(args.run_dir, args.k)
    if use_ctg and prev_k is not None:
        prev_fa = os.path.join(args.run_dir, f"uutigs-{prev_k}.fasta")
        if not os.path.exists(prev_fa):
            sys.exit(f"round k={args.k} used --ctg-kmers but {prev_fa} is missing")
        ctgs = _load_fasta(prev_fa)
        print(f"replaying {len(ctgs)} ctg contigs from round k={prev_k} ...")
        fo.add_ctg_seqs([s for s, _ in ctgs], [d for _, d in ctgs])
    vals, counts, lch, rch = fo.finalize_arrays()
    vals_words = vals  # k > 32: the [U, W64] word matrix (contig check input)
    if vals.ndim == 2:
        vals = (vals[:, 0].astype(object) << 64) | vals[:, 1].astype(object)
        for j in range(2, vals_words.shape[1]):
            vals = (vals << 64) | vals_words[:, j].astype(object)
    uniq, total = len(vals), int(counts.sum())
    print(f"fast oracle: unique={uniq} total_count_sum={total}")

    failures = 0

    # --use-qf runs carry the reference's documented "negligible amount of
    # variation in kmer count results" (README_v2.md:91 — TCF fingerprint
    # collisions); exact parity is only the contract with the filter off
    used_qf = _run_used_qf(args.run_dir)
    tol = 1e-4 if used_qf else 0.0
    if used_qf:
        print("run used --use-qf: tolerating <= 0.01% count variation "
              "(documented TCF behavior, README_v2.md:91)")
    num_dropped = 0
    if args.allow_recorded_drops:
        import json

        sidecar = os.path.join(args.run_dir, f"round-{args.k}-result.json")
        if os.path.exists(sidecar):
            num_dropped = int(json.load(open(sidecar)).get("num_dropped", 0))
        print(f"drop mode: run recorded num_dropped={num_dropped} — allowing "
              "that many perturbed records")

    got_ut = _run_scalars(args.run_dir, args.k)
    if got_ut is not None and not num_dropped:
        got_u, got_t = got_ut
        ok = abs(got_u - uniq) <= tol * uniq and abs(got_t - total) <= tol * total
        failures += not ok
        print(f"run record (k={args.k}): unique={got_u} total={got_t} "
              f"-> {'OK' if ok else 'MISMATCH'}")
    elif got_ut is None:
        print("run record: not found (skipped)")

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
        bad = missing = present = 0
        for v, c, l, r in zip(vals, counts, lch, rch):
            e = got.get(val_to_kmer(int(v), args.k))
            if e is None:
                missing += 1
                continue
            present += 1
            if e != (int(c), chr(l), chr(r)):
                bad += 1
                if bad <= 3:
                    print(f"  dump mismatch {val_to_kmer(int(v), args.k)}: "
                          f"run={e} oracle=({int(c)},{chr(l)},{chr(r)})")
        run_only = len(got) - present
        if num_dropped:
            # each dropped insert perturbs only its own kmer's record (count
            # one lower, ext one vote short, or purged/kept across the dmin /
            # X-purge line) — so the total record-level damage is bounded by
            # the number of dropped inserts the run itself reported
            affected = missing + bad + run_only
            ok = affected <= num_dropped
            failures += not ok
            print(f"dump: {len(got)} kmers vs {exp_n} oracle; missing={missing}"
                  f" mismatched={bad} run_only={run_only} (affected={affected}"
                  f" <= dropped={num_dropped}?) -> {'OK' if ok else 'MISMATCH'}")
            if got_ut is not None:
                got_u, got_t = got_ut
                tot_dump = sum(c for c, _, _ in got.values())
                ok2 = got_u == len(got) and got_t == tot_dump
                failures += not ok2
                print(f"run record vs its own dump: unique {got_u}=={len(got)}"
                      f" total {got_t}=={tot_dump} -> "
                      f"{'OK' if ok2 else 'MISMATCH'}")
        else:
            ok = (abs(len(got) - exp_n) <= tol * exp_n
                  and (bad + missing + run_only) <= tol * exp_n)
            failures += not ok
            print(f"dump: {len(got)} kmers vs {exp_n} expected, "
                  f"{bad + missing + run_only} mismatched "
                  f"-> {'OK' if ok else 'MISMATCH'}")
    else:
        print("dump: not found (skipped)")

    if num_dropped and not args.no_contigs:
        print("contigs: skipped — dropped kmers legitimately break traversal "
              "chains (drop mode)")
    elif not args.no_contigs:
        failures += _check_contigs(args.run_dir, args.k, vals_words, counts,
                                   lch, rch)

    if failures:
        sys.exit(f"FAIL: {failures} comparison(s) mismatched")
    print("PASS: run output matches the fast oracle")


if __name__ == "__main__":
    main()
