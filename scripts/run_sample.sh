#!/usr/bin/env bash
# Smoke test — the run_sample.sh analogue (README_v2.md:95-98 documents the
# reference's 4-process k=21 sample run; its script and FASTQs are absent from
# the snapshot, so this generates a deterministic sample and checks the
# golden-count contract the same way).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/mhm2_tpu_sample}
rm -rf "$OUT"
mkdir -p "$OUT"

python - "$OUT" <<'EOF'
import sys, numpy as np
out = sys.argv[1]
rng = np.random.default_rng(20260816)
genome = "".join(rng.choice(list("ACGT"), 5000))
comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
with open(out + "/sample.fastq", "w") as f:
    for i in range(500):
        pos = int(rng.integers(0, 5000 - 150))
        frag = genome[pos:pos + 150]
        r1, r2 = frag[:100], "".join(comp[c] for c in reversed(frag[50:]))
        q = "".join(chr(int(x)) for x in rng.integers(53, 74, 100))
        f.write(f"@p{i}/1\n{r1}\n+\n{q}\n@p{i}/2\n{r2}\n+\n{q}\n")
print("wrote", out + "/sample.fastq")
EOF

python -m mhm2_kmer_analysis_v2_tpu.pipeline.main \
    -r "$OUT/sample.fastq" -k 21 -o "$OUT/run" --dump-kmers -v

KMERS=$(grep -oP 'Total kmers: \K\d+' "$OUT/run/mhm2.log" | tail -1)
echo "Total kmers: $KMERS"
# deterministic golden count for this generated sample (like the reference's
# expected_count = 34477443 for its bundled sample, run_app.py:71)
EXPECTED=4942
if [ "$KMERS" -eq "$EXPECTED" ]; then
    echo "SUCCESS: run completed with $KMERS unique kmers (expected $EXPECTED)"
else
    echo "FAILURE: expected $EXPECTED unique kmers, got $KMERS"
    exit 1
fi
