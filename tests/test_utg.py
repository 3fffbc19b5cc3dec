"""UU-tig construction: pointer-doubling builder vs the oracle walker."""

import numpy as np

from mhm2_kmer_analysis_v2_tpu.contig import utg
from mhm2_kmer_analysis_v2_tpu.oracle import OracleCounter, revcomp_str, kmer_to_val

from util import genome_reads, oracle_count


def _canon_set(seqs):
    return {min(s, revcomp_str(s)) for s in seqs}


def _build_from_oracle(oc: OracleCounter, k: int) -> utg.Utgs:
    fin = oc.finalize()
    items = sorted((kmer_to_val(kmer), c, l, r) for kmer, (c, l, r) in fin.items())
    vals = np.array([v for v, _, _, _ in items], np.uint64)
    counts = np.array([c for _, c, _, _ in items], np.int64)
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    left = np.array([code[l] for _, _, l, _ in items], np.int64)
    right = np.array([code[r] for _, _, _, r in items], np.int64)
    return utg.build_utgs(vals, counts, left, right, k)


def test_single_chain():
    """Deep coverage of one genome with no repeats -> one contig."""
    k = 21
    reads = genome_reads(200, 60, genome_len=300, seed=42)
    oc = oracle_count(reads, k)
    got = _build_from_oracle(oc, k)
    exp = oc.utgs()
    assert _canon_set(got.seqs) == exp
    # deep even coverage: expect one long contig reconstructing most of the genome
    assert max(len(s) for s in got.seqs) > 150


def test_matches_oracle_with_errors():
    k = 21
    for seed in (1, 2, 3, 4):
        reads = genome_reads(150, 70, genome_len=400, seed=seed, err=0.02)
        oc = oracle_count(reads, k)
        got = _build_from_oracle(oc, k)
        exp = oc.utgs()
        assert _canon_set(got.seqs) == exp, seed


def test_multiple_components():
    k = 21
    reads = genome_reads(100, 60, genome_len=250, seed=7)
    reads += genome_reads(100, 60, genome_len=250, seed=8)
    oc = oracle_count(reads, k)
    got = _build_from_oracle(oc, k)
    assert _canon_set(got.seqs) == oc.utgs()


def test_cycle():
    """A circular genome yields a cyclic UU graph; broken deterministically."""
    k = 21
    rng = np.random.default_rng(11)
    circ = "".join(rng.choice(list("ACGT"), 120))
    genome = circ + circ[: k + 40]  # wrap-around reads cover the junction
    reads = []
    for _ in range(150):
        p = int(rng.integers(0, 120))
        reads.append((genome[p : p + 60], "K" * 60))
    oc = oracle_count(reads, k)
    got = _build_from_oracle(oc, k)
    exp = oc.utgs()
    assert _canon_set(got.seqs) == exp


def test_every_kmer_on_some_contig():
    k = 21
    reads = genome_reads(120, 60, genome_len=300, seed=13, err=0.01)
    oc = oracle_count(reads, k)
    fin = oc.finalize()
    got = _build_from_oracle(oc, k)
    covered = set()
    for s in got.seqs:
        for i in range(len(s) - k + 1):
            covered.add(min(s[i : i + k], revcomp_str(s[i : i + k])))
    assert set(fin) <= covered


def test_utg_depths():
    k = 21
    reads = genome_reads(80, 60, genome_len=200, seed=17)
    oc = oracle_count(reads, k)
    got = _build_from_oracle(oc, k)
    fin = oc.finalize()
    for s, d in zip(got.seqs, got.depths):
        kmers = [min(s[i : i + k], revcomp_str(s[i : i + k])) for i in range(len(s) - k + 1)]
        counts = [fin[km][0] for km in kmers if km in fin]
        if counts:
            assert abs(d - np.mean(counts)) < 1e-6 or d > 0


def test_empty_table():
    got = utg.build_utgs(np.array([], np.uint64), np.array([], np.int64),
                         np.array([], np.int64), np.array([], np.int64), 21)
    assert got.seqs == []


def test_dump_fasta(tmp_path):
    k = 21
    reads = genome_reads(80, 60, genome_len=200, seed=19)
    oc = oracle_count(reads, k)
    got = _build_from_oracle(oc, k)
    path = tmp_path / "uutigs-21.fasta"
    utg.dump_uutigs(got, k, str(path))
    lines = path.read_text().splitlines()
    assert len(lines) == 2 * len(got.seqs)
    assert lines[0].startswith(">uutig_0 ")


def test_mw_vectorized_matches_dict():
    """build_utgs_mw (byte-matrix pointer doubling) == build_utgs_dict == oracle."""
    for k, seed in ((33, 1), (33, 2), (55, 3), (21, 4)):
        reads = genome_reads(120, k + 50, genome_len=400, seed=seed, err=0.015)
        oc = oracle_count(reads, k)
        fin = oc.finalize()
        items = sorted(fin.items())
        strs = [s for s, _ in items]
        counts = [v[0] for _, v in items]
        lefts = [v[1] for _, v in items]
        rights = [v[2] for _, v in items]
        got_mw = utg.build_utgs_mw(strs, counts, lefts, rights, k)
        got_dict = utg.build_utgs_dict(strs, counts, lefts, rights, k)
        assert _canon_set(got_mw.seqs) == _canon_set(got_dict.seqs) == oc.utgs(), (k, seed)


def test_device_core_matches_numpy():
    """The jnp (device) pointer-doubling core produces identical contigs."""
    for seed in (21, 22, 23):
        k = 21
        reads = genome_reads(150, 70, genome_len=500, seed=seed, err=0.015)
        oc = oracle_count(reads, k)
        fin = oc.finalize()
        items = sorted((kmer_to_val(s), c, l, r) for s, (c, l, r) in fin.items())
        vals = np.array([v for v, _, _, _ in items], np.uint64)
        counts = np.array([c for _, c, _, _ in items], np.int64)
        code = {"A": 0, "C": 1, "G": 2, "T": 3}
        left = np.array([code[l] for _, _, l, _ in items], np.int64)
        right = np.array([code[r] for _, _, _, r in items], np.int64)
        got_np = utg.build_utgs(vals, counts, left, right, k)
        got_dev = utg.build_utgs_device(vals, counts, left, right, k)
        assert got_np.seqs == got_dev.seqs, seed
        assert np.allclose(got_np.depths, got_dev.depths)
        assert _canon_set(got_dev.seqs) == oc.utgs()


def test_sharded_traversal_matches_numpy():
    """Distributed pointer doubling (all_to_all request/response rounds) ==
    the single-device builder."""
    import jax
    from jax.sharding import Mesh
    from mhm2_kmer_analysis_v2_tpu.contig import distributed

    for n_shards, seed in ((2, 31), (4, 32), (8, 33)):
        k = 21
        reads = genome_reads(150, 70, genome_len=400, seed=seed, err=0.01)
        oc = oracle_count(reads, k)
        fin = oc.finalize()
        items = sorted((kmer_to_val(s), c, l, r) for s, (c, l, r) in fin.items())
        vals = np.array([v for v, _, _, _ in items], np.uint64)
        counts = np.array([c for _, c, _, _ in items], np.int64)
        code = {"A": 0, "C": 1, "G": 2, "T": 3}
        left = np.array([code[l] for _, _, l, _ in items], np.int64)
        right = np.array([code[r] for _, _, _, r in items], np.int64)
        exp = utg.build_utgs(vals, counts, left, right, k)
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
        got = distributed.build_utgs_sharded(vals, counts, left, right, k, mesh)
        assert sorted(got.seqs) == sorted(exp.seqs), (n_shards, seed)
        assert _canon_set(got.seqs) == oc.utgs()


def test_sharded_traversal_tiny_n_padded_shards():
    """Regression: with N so small that some shards hold only padding, the
    owner-routing bounds must not alias the last real shard (padding shards
    previously inherited vals[N-1] as their bound, stealing the largest
    k-mers' successor lookups and dropping edges)."""
    import jax
    from jax.sharding import Mesh
    from mhm2_kmer_analysis_v2_tpu.contig import distributed

    k = 21
    for seed in range(6):
        # tiny genomes -> N ~ 5-15 distinct kept kmers on 8 shards
        reads = genome_reads(40, 32, genome_len=32, seed=100 + seed)
        oc = oracle_count(reads, k)
        fin = oc.finalize()
        if not fin:
            continue
        items = sorted((kmer_to_val(s), c, l, r) for s, (c, l, r) in fin.items())
        vals = np.array([v for v, _, _, _ in items], np.uint64)
        counts = np.array([c for _, c, _, _ in items], np.int64)
        code = {"A": 0, "C": 1, "G": 2, "T": 3}
        left = np.array([code[l] for _, _, l, _ in items], np.int64)
        right = np.array([code[r] for _, _, _, r in items], np.int64)
        exp = utg.build_utgs(vals, counts, left, right, k)
        mesh = Mesh(np.array(jax.devices()[:8]), ("sh",))
        got = distributed.build_utgs_sharded(vals, counts, left, right, k, mesh)
        assert sorted(got.seqs) == sorted(exp.seqs), (seed, len(vals))


def test_sharded_traversal_tiny_cap_spills():
    """A deliberately tiny exchange cap (forces many request spill rounds)
    must not change the result — memory stays O(n_local + cap*n_shards)."""
    import jax
    from jax.sharding import Mesh
    from mhm2_kmer_analysis_v2_tpu.contig import distributed

    k = 21
    reads = genome_reads(150, 70, genome_len=400, seed=35, err=0.01)
    oc = oracle_count(reads, k)
    fin = oc.finalize()
    items = sorted((kmer_to_val(s), c, l, r) for s, (c, l, r) in fin.items())
    vals = np.array([v for v, _, _, _ in items], np.uint64)
    counts = np.array([c for _, c, _, _ in items], np.int64)
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    left = np.array([code[l] for _, _, l, _ in items], np.int64)
    right = np.array([code[r] for _, _, _, r in items], np.int64)
    exp = utg.build_utgs(vals, counts, left, right, k)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sh",))
    got = distributed.build_utgs_sharded(vals, counts, left, right, k, mesh, cap=8)
    assert sorted(got.seqs) == sorted(exp.seqs)


def test_rc_vals_matches_slow_loop():
    """The byteswap 2-bit-group reversal in _rc_vals must equal the obvious
    per-base shift loop for every k (guards the bit-twiddling)."""
    rng = np.random.default_rng(11)
    for k in (1, 2, 15, 21, 27, 31, 32):
        vals = rng.integers(0, 1 << min(2 * k, 63), 1000, dtype=np.uint64)
        if 2 * k == 64:
            vals |= rng.integers(0, 2, 1000, dtype=np.uint64) << np.uint64(63)
        slow_v = vals.copy()
        slow = np.zeros_like(vals)
        for _ in range(k):
            slow = (slow << np.uint64(2)) | (np.uint64(3) - (slow_v & np.uint64(3)))
            slow_v >>= np.uint64(2)
        np.testing.assert_array_equal(utg._rc_vals(vals, k), slow)
