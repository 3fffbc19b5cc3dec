#!/usr/bin/env python3
"""Synthetic metagenome FASTQ generator (ArcticSynth-class scale testing).

The reference names ArcticSynth (synthetic), SRR9654970 (1.8 Gb) and
SRR5819383 (15.9 Gb) as its datasets (/root/reference/README.md:90-109); none
can be downloaded in this zero-egress container, so scale runs use this
generator: a multi-species synthetic metagenome with log-spread abundances,
paired 150 bp reads with indel-free substitution errors, occasional Ns, and a
low-quality tail — enough realism to exercise ingest, merge, minimizer
balance, error-kmer load, and the singleton filter at GB scale.

Usage: python scripts/gen_synth.py out.fastq --gb 1.2 [--seed 1]
Writes an interleaved paired FASTQ (our -r convention) and prints one JSON
line with the generation config.
"""

import argparse
import json
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--gb", type=float, default=1.2, help="approx output size")
    ap.add_argument("--genomes", type=int, default=12)
    ap.add_argument("--total-mbp", type=float, default=40.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--err", type=float, default=0.003)
    ap.add_argument("--n-rate", type=float, default=0.0005)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    L = args.read_len
    # bytes per pair = 2 records x (name ~14 + seq L+1 + '+' 2 + quals L+1)
    n_pairs = int(args.gb * 1e9 / (4 * L + 36))

    # genome sizes: log-spread, sum to total_mbp
    raw = np.exp(rng.uniform(0, 2.2, args.genomes))
    sizes = (raw / raw.sum() * args.total_mbp * 1e6).astype(np.int64)
    sizes = np.maximum(sizes, 200_000)
    genomes = [rng.integers(0, 4, s, dtype=np.uint8) for s in sizes]
    # abundance skew independent of size (log-uniform)
    ab = np.exp(rng.uniform(0, 3.0, args.genomes))
    ab = ab / ab.sum()

    insert_mu, insert_sd = 320, 40
    CH = 20000  # pairs per write chunk
    comp = np.array([3, 2, 1, 0], np.uint8)
    qual_hi = np.arange(60, 74)  # mostly good
    qual_lo = np.arange(35, 53)  # below 33+20 cutoff tail

    written = 0
    with open(args.out, "w", buffering=1 << 22) as f:
        while written < n_pairs:
            n = min(CH, n_pairs - written)
            gsel = rng.choice(args.genomes, n, p=ab)
            lines = []
            for gi in range(args.genomes):
                idx = np.nonzero(gsel == gi)[0]
                if len(idx) == 0:
                    continue
                g = genomes[gi]
                # lower clip below 2L so a realistic fraction of pairs
                # overlaps enough to merge (MIN_OVERLAP=12)
                ins = np.clip(
                    rng.normal(insert_mu, insert_sd, len(idx)).astype(np.int64),
                    int(1.4 * L), 4 * L,
                )
                pos = rng.integers(0, len(g) - ins.max() - 1, len(idx))
                offs = np.arange(L)
                s1 = g[pos[:, None] + offs[None, :]]
                # mate 2 = revcomp of the fragment end
                end = pos + ins
                s2f = g[end[:, None] - L + offs[None, :]]
                s2 = comp[s2f[:, ::-1]]
                for s in (s1, s2):
                    err = rng.random(s.shape) < args.err
                    s[err] = (s[err] + rng.integers(1, 4, err.sum())) % 4
                b1 = BASES[s1]
                b2 = BASES[s2]
                nmask1 = rng.random(s1.shape) < args.n_rate
                nmask2 = rng.random(s2.shape) < args.n_rate
                b1[nmask1] = ord("N")
                b2[nmask2] = ord("N")
                q1 = rng.choice(qual_hi, s1.shape).astype(np.uint8)
                q2 = rng.choice(qual_hi, s2.shape).astype(np.uint8)
                lowq1 = rng.random(s1.shape) < 0.03
                lowq2 = rng.random(s2.shape) < 0.03
                q1[lowq1] = rng.choice(qual_lo, int(lowq1.sum()))
                q2[lowq2] = rng.choice(qual_lo, int(lowq2.sum()))
                for j, ridx in enumerate(idx):
                    i = written + int(ridx)
                    lines.append(
                        f"@synth{i}/1\n{b1[j].tobytes().decode()}\n+\n"
                        f"{q1[j].tobytes().decode()}\n"
                        f"@synth{i}/2\n{b2[j].tobytes().decode()}\n+\n"
                        f"{q2[j].tobytes().decode()}\n"
                    )
            f.write("".join(lines))
            written += n
            if written % (50 * CH) < CH:
                print(f"\r{written}/{n_pairs} pairs", end="", file=sys.stderr, flush=True)
    print("", file=sys.stderr)
    print(json.dumps({
        "out": args.out, "pairs": n_pairs, "read_len": L,
        "genomes": args.genomes, "total_mbp": float(sizes.sum() / 1e6),
        "err": args.err, "seed": args.seed,
    }))


if __name__ == "__main__":
    main()
