"""Device-resident scalable traversal (contig/device.py) vs host builder/oracle."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mhm2_kmer_analysis_v2_tpu.contig import device as cdev, utg
from mhm2_kmer_analysis_v2_tpu.oracle import kmer_to_val, revcomp_str
from mhm2_kmer_analysis_v2_tpu.ops.kmer_ops import kmer_records, minimizer_len_for_k

from util import genome_reads, oracle_count

EMPTY = 0xFFFFFFFF


def _canon_set(seqs):
    return {min(s, revcomp_str(s)) for s in seqs}


def _depth_map(utgs):
    return {min(s, revcomp_str(s)): round(d, 6) for s, d in zip(utgs.seqs, utgs.depths)}


def _items_from_oracle(oc):
    fin = oc.finalize()
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    items = sorted((kmer_to_val(s), c, code[l], code[r]) for s, (c, l, r) in fin.items())
    vals = np.array([v for v, _, _, _ in items], np.uint64)
    counts = np.array([c for _, c, _, _ in items], np.int64)
    left = np.array([l for _, _, l, _ in items], np.int64)
    right = np.array([r for _, _, _, r in items], np.int64)
    return vals, counts, left, right


def _fin_arrays(vals, counts, left, right, k, n_shards, extra_cap=0):
    """Place kmers on shards with the traversal's own routing function and
    build FinalizedShard-style [n_shards, K] arrays (scattered slot order to
    exercise the device-side sort)."""
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    m = minimizer_len_for_k(k)
    owner = np.asarray(
        cdev.route_kmer_pairs(jnp.asarray(hi), jnp.asarray(lo), k, m, n_shards)
    )
    per = np.bincount(owner, minlength=n_shards)
    K = int(per.max()) + 1 + extra_cap
    shp = (n_shards, K)
    f_hi = np.full(shp, EMPTY, np.uint32)
    f_lo = np.full(shp, EMPTY, np.uint32)
    f_c = np.zeros(shp, np.int32)
    f_l = np.zeros(shp, np.int32)
    f_r = np.zeros(shp, np.int32)
    f_k = np.zeros(shp, bool)
    rng = np.random.default_rng(7)
    for s in range(n_shards):
        idx = np.nonzero(owner == s)[0]
        slots = rng.permutation(K)[: len(idx)]  # scattered, unsorted slots
        f_hi[s, slots] = hi[idx]
        f_lo[s, slots] = lo[idx]
        f_c[s, slots] = counts[idx]
        f_l[s, slots] = left[idx]
        f_r[s, slots] = right[idx]
        f_k[s, slots] = True
    return f_hi, f_lo, f_c, f_l, f_r, f_k


class _Fin:
    def __init__(self, arrs):
        (self.keys_hi, self.keys_lo, self.counts, self.left_ext,
         self.right_ext, self.keep) = [jnp.asarray(a) for a in arrs]


def test_route_matches_count_step_placement():
    """route_kmer_pairs (standalone-kmer routing) == kmer_records' target for
    the same kmers — the traversal looks up kmers where the count step put
    them."""
    rng = np.random.default_rng(3)
    for k, n_shards in ((21, 8), (15, 5), (32, 8), (17, 3)):
        B, L = 8, 80
        codes = rng.integers(0, 4, (B, L)).astype(np.int32)
        lengths = np.full((B,), L, np.int32)
        rec = kmer_records(jnp.asarray(codes), jnp.zeros((B, L), bool),
                           jnp.asarray(lengths), k=k, n_shards=n_shards)
        valid = np.asarray(rec["valid"])
        ch = np.asarray(rec["canon_hi"])[valid]
        cl = np.asarray(rec["canon_lo"])[valid]
        want = np.asarray(rec["target"])[valid]
        m = minimizer_len_for_k(k)
        got = np.asarray(
            cdev.route_kmer_pairs(jnp.asarray(ch), jnp.asarray(cl), k, m, n_shards)
        )
        assert (got == want).all(), (k, n_shards)


def test_device_traversal_matches_host_builder():
    for n_shards, seed in ((1, 41), (2, 42), (4, 43), (8, 44)):
        k = 21
        reads = genome_reads(150, 70, genome_len=400, seed=seed, err=0.01)
        oc = oracle_count(reads, k)
        vals, counts, left, right = _items_from_oracle(oc)
        if len(vals) == 0:
            continue
        exp = utg.build_utgs(vals, counts, left, right, k)
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
        fin = _Fin(_fin_arrays(vals, counts, left, right, k, n_shards))
        got = cdev.build_utgs_from_fin(fin, k, mesh)
        assert _canon_set(got.seqs) == _canon_set(exp.seqs) == oc.utgs(), (n_shards, seed)
        assert _depth_map(got) == _depth_map(exp), (n_shards, seed)


def test_device_traversal_cycles():
    """Circular genome -> cycle contigs; rotation must match the oracle walk
    (cut at the canonical orientation of the cycle's smallest k-mer)."""
    rng = np.random.default_rng(5)
    k = 15
    genome = "".join(rng.choice(list("ACGT"), 120))
    circ = genome + genome[: k + 10]
    reads = []
    for i in range(0, len(circ) - 40):
        seq = circ[i : i + 40]
        reads.append((seq, "I" * len(seq)))
    oc = oracle_count(reads, k)
    vals, counts, left, right = _items_from_oracle(oc)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sh",))
    fin = _Fin(_fin_arrays(vals, counts, left, right, k, 4))
    got = cdev.build_utgs_from_fin(fin, k, mesh)
    # raw equality (not just canonical-set): rotations must match the oracle
    assert set(got.seqs) == oc.utgs()


def test_device_traversal_small_k_and_tiny_tables():
    for k, n_reads, seed in ((15, 40, 9), (31, 60, 10), (32, 60, 11)):
        reads = genome_reads(n_reads, max(70, k + 10), genome_len=300, seed=seed)
        oc = oracle_count(reads, k)
        vals, counts, left, right = _items_from_oracle(oc)
        if len(vals) == 0:
            continue
        exp = utg.build_utgs(vals, counts, left, right, k)
        mesh = Mesh(np.array(jax.devices()[:8]), ("sh",))
        fin = _Fin(_fin_arrays(vals, counts, left, right, k, 8, extra_cap=13))
        got = cdev.build_utgs_from_fin(fin, k, mesh)
        assert _canon_set(got.seqs) == _canon_set(exp.seqs), (k, seed)
        assert _depth_map(got) == _depth_map(exp), (k, seed)


def test_contigging_device_flat_host_memory(tmp_path):
    """VERDICT r2 item 1 'done' criterion: peak HOST allocation during the
    scalable contigging stays ~flat while the per-shard table grows ~8x
    (chunked slice fetches + O(longest contig) carry; the round-2 path
    gathered the whole global table)."""
    import tracemalloc

    from mhm2_kmer_analysis_v2_tpu.contig.device import contigging_device
    from jax.sharding import NamedSharding, PartitionSpec as P

    k = 21
    mesh = Mesh(np.array(jax.devices()[:8]), ("sh",))

    def run(genome_len, tag):
        rng = np.random.default_rng(99)
        genome = "".join(rng.choice(list("ACGT"), genome_len))
        # two full-genome 'reads' -> every interior k-mer has count 2 and
        # clean UU extensions (one long chain, cheap to build at any scale)
        from mhm2_kmer_analysis_v2_tpu.oracle_fast import FastOracleCounter
        fo = FastOracleCounter(k)
        fo.add_reads([genome, genome], None)
        vals, counts, lch, rch = fo.finalize_arrays()
        code = {ord("A"): 0, ord("C"): 1, ord("G"): 2, ord("T"): 3}
        left = np.array([code[c] for c in lch], np.int64)
        right = np.array([code[c] for c in rch], np.int64)
        fin = _Fin(_fin_arrays(vals, counts, left, right, k, 8))
        out = tmp_path / tag
        out.mkdir()
        tracemalloc.start()
        utgs, n_all, len_all = contigging_device(
            fin, k, mesh, str(out), "uutigs-test.fasta", keep_contigs=False)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        # sanity: the chain reconstructs the genome
        assert len_all >= genome_len - 2 * k, (len_all, genome_len)
        return peak

    p_small = run(30_000, "small")
    p_large = run(240_000, "large")  # 8x the table
    assert p_large < 1.5 * p_small + (4 << 20), (p_small, p_large)


def _fin_arrays_mw(strs, counts, lefts, rights, k, n_shards, extra_cap=0):
    """Multi-word FinalizedMW-style [n_shards, W, K] arrays placed with the
    traversal's own routing."""
    from mhm2_kmer_analysis_v2_tpu.ops.kmer_multiword import (
        n_words, route_kmer_words)
    from mhm2_kmer_analysis_v2_tpu.oracle import kmer_to_val

    W = n_words(k)
    r = k - 16 * (W - 1)
    N = len(strs)
    words = np.zeros((W, N), np.uint32)
    for i, s in enumerate(strs):
        v = kmer_to_val(s)
        for j in range(W):
            sh = 32 * (W - 1 - j)
            words[j, i] = (v >> sh) & 0xFFFFFFFF
    owner = np.asarray(route_kmer_words(
        [jnp.asarray(words[j]) for j in range(W)], k, n_shards))
    per = np.bincount(owner, minlength=n_shards)
    K = int(per.max()) + 1 + extra_cap
    f_k = np.zeros((n_shards, W, K), np.uint32) + EMPTY
    f_c = np.zeros((n_shards, K), np.int32)
    f_l = np.zeros((n_shards, K), np.int32)
    f_r = np.zeros((n_shards, K), np.int32)
    f_keep = np.zeros((n_shards, K), bool)
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    rng = np.random.default_rng(8)
    for s in range(n_shards):
        idx = np.nonzero(owner == s)[0]
        slots = rng.permutation(K)[: len(idx)]
        for j in range(W):
            f_k[s, j, slots] = words[j, idx]
        f_c[s, slots] = counts[idx]
        f_l[s, slots] = [code[lefts[i]] for i in idx]
        f_r[s, slots] = [code[rights[i]] for i in idx]
        f_keep[s, slots] = True
    return f_k, f_c, f_l, f_r, f_keep


class _FinMW:
    def __init__(self, arrs):
        (self.keys, self.counts, self.left_ext, self.right_ext,
         self.keep) = [jnp.asarray(a) for a in arrs]


def test_device_traversal_multiword():
    """Device traversal for k > 32 (W-word stacks) == the host mw builder and
    the oracle walk, across shard counts and the MAX_K set."""
    for k, n_shards, seed in ((33, 4, 61), (64, 8, 62), (96, 2, 63), (160, 4, 64)):
        reads = genome_reads(120, k + 40, genome_len=500, seed=seed, err=0.01)
        oc = oracle_count(reads, k)
        fin = oc.finalize()
        items = sorted(fin.items())
        if not items:
            continue
        strs = [s for s, _ in items]
        counts = np.array([c for _, (c, _, _) in items], np.int64)
        lefts = [l for _, (_, l, _) in items]
        rights = [r for _, (_, _, r) in items]
        exp = utg.build_utgs_mw(strs, counts, lefts, rights, k)
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sh",))
        fi = _FinMW(_fin_arrays_mw(strs, counts, lefts, rights, k, n_shards,
                                   extra_cap=7))
        got = cdev.build_utgs_from_fin(fi, k, mesh)
        assert _canon_set(got.seqs) == _canon_set(exp.seqs) == oc.utgs(), (k, n_shards)
        assert _depth_map(got) == _depth_map(exp), (k, n_shards)
