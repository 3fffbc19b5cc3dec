"""Quadratic (triangular) probe schedule at high table load.

The insert/query/ctg/filter paths switch from linear to quadratic probing at
cap >= QUAD_MIN_CAP (shard_table._advance); these tests pin the high-load
regime where chains are long and the schedule actually matters, and check
that every reader follows the placement schedule of the writer.
"""

import numpy as np
import jax.numpy as jnp

from mhm2_kmer_analysis_v2_tpu.table import shard_table, shard_table_mw
from mhm2_kmer_analysis_v2_tpu.table.query import lookup_batch
from mhm2_kmer_analysis_v2_tpu.table.singleton_filter import (
    create_filter, insert_batch_qf,
)


def _random_records(n, seed, kbits_hi=10):
    """Random canonical-key stand-ins (placement doesn't care about kmer
    validity): hi in a narrow range so full_hi_range=False stays legal."""
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 1 << kbits_hi, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    left = rng.integers(0, 5, n).astype(np.int32)
    right = rng.integers(0, 5, n).astype(np.int32)
    return hi, lo, left, right


def _expected(hi, lo, left, right):
    exp = {}
    for h, l, le, ri in zip(hi.tolist(), lo.tolist(), left.tolist(), right.tolist()):
        c, e = exp.setdefault((h, l), [0, [0] * 9])
        e[le if le < 4 else 8] += 1
        if ri < 4:
            e[4 + ri] += 1
        exp[(h, l)][0] += 1
    return exp


def _check_table(table, exp):
    khi = np.asarray(table.keys_hi).astype(np.uint64)
    klo = np.asarray(table.keys_lo).astype(np.uint64)
    occ = (khi != 0xFFFFFFFF) | (klo != 0xFFFFFFFF)
    extc9 = np.asarray(table.extc).reshape(9, -1).T[occ]  # bucket-major
    got = {}
    for h, l, e in zip(khi[occ], klo[occ], extc9):
        got[(int(h), int(l))] = (int(e[:4].sum() + e[8]), list(map(int, e)))
    assert len(got) == len(exp)
    for key, (cnt, e9) in exp.items():
        assert got[key][0] == cnt
        assert got[key][1] == e9


def test_quadratic_high_load_insert_lossless():
    # cap >= QUAD_MIN_CAP and ~80% load: long chains, quadratic schedule
    n = 9000
    hi, lo, left, right = _random_records(n, seed=3)
    table = shard_table.create(int(n * 0.66 / 0.80))  # ~80% final load
    assert table.capacity >= shard_table.QUAD_MIN_CAP
    table = shard_table.insert_batch(
        table, jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(left),
        jnp.asarray(right), jnp.ones(n, jnp.int32), jnp.ones(n, bool),
        full_hi_range=False,
    )
    assert int(table.num_dropped) == 0
    _check_table(table, _expected(hi, lo, left, right))
    # probe_stats must invert the triangular displacements exactly
    stats = shard_table.probe_stats(table)
    assert stats["occupied"] == len(_expected(hi, lo, left, right))
    assert 1 <= stats["max_probe"] <= shard_table.MAX_PROBE


def test_quadratic_lookup_follows_insert_schedule():
    n = 6000
    hi, lo, left, right = _random_records(n, seed=7)
    table = shard_table.create(n)
    assert table.capacity >= shard_table.QUAD_MIN_CAP
    table = shard_table.insert_batch(
        table, jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(left),
        jnp.asarray(right), jnp.ones(n, jnp.int32), jnp.ones(n, bool),
    )
    exp = _expected(hi, lo, left, right)
    keys = list(exp.keys())
    qhi = jnp.asarray(np.array([k[0] for k in keys], dtype=np.uint32))
    qlo = jnp.asarray(np.array([k[1] for k in keys], dtype=np.uint32))
    found, counts, _ = lookup_batch(table, qhi, qlo)
    assert bool(np.all(np.asarray(found)))
    assert np.asarray(counts).tolist() == [exp[k][0] for k in keys]
    # absent keys must come back not-found
    found2, _, _ = lookup_batch(
        table, qhi ^ jnp.uint32(0x400), qlo ^ jnp.uint32(1)
    )
    miss = [
        ((int(h) ^ 0x400), (int(l) ^ 1)) not in exp
        for h, l in zip(np.asarray(qhi), np.asarray(qlo))
    ]
    assert np.asarray(found2)[np.array(miss)].sum() == 0


def test_quadratic_qf_mode_counts():
    n = 5000
    hi, lo, left, right = _random_records(n, seed=11)
    table = shard_table.create(n)
    filt = create_filter(n)
    assert table.capacity >= shard_table.QUAD_MIN_CAP
    table, filt = insert_batch_qf(
        table, filt, jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(left),
        jnp.asarray(right), jnp.ones(n, jnp.int32), jnp.ones(n, bool),
    )
    assert int(table.num_dropped) == 0
    exp = _expected(hi, lo, left, right)
    # >=2-occurrence kmers must be in the main table with exact counts
    khi = np.asarray(table.keys_hi).astype(np.uint64)
    klo = np.asarray(table.keys_lo).astype(np.uint64)
    occ = (khi != 0xFFFFFFFF) | (klo != 0xFFFFFFFF)
    extc9 = np.asarray(table.extc).reshape(9, -1).T[occ]  # bucket-major
    got = {
        (int(h), int(l)): int(e[:4].sum() + e[8])
        for h, l, e in zip(khi[occ], klo[occ], extc9)
    }
    for key, (cnt, _) in exp.items():
        if cnt >= 2:
            assert got.get(key) == cnt, key


def test_quadratic_mw_high_load():
    n = 8000
    rng = np.random.default_rng(17)
    words = rng.integers(0, 1 << 32, (3, n), dtype=np.uint32)
    # word 0 narrow so the single-word emptiness probe stays legal
    words[0] &= np.uint32(0x3FFFFFFF)
    left = rng.integers(0, 5, n).astype(np.int32)
    right = rng.integers(0, 5, n).astype(np.int32)
    table = shard_table_mw.create(int(n * 0.66 / 0.80), n_words=3)
    assert table.capacity >= shard_table.QUAD_MIN_CAP
    table = shard_table_mw.insert_batch_mw(
        table, jnp.asarray(words), jnp.asarray(left), jnp.asarray(right),
        jnp.ones(n, jnp.int32), jnp.ones(n, bool), w0_full_range=False,
    )
    assert int(table.num_dropped) == 0
    cap = table.capacity
    keys = np.asarray(table.keys).reshape(3, cap)
    occ = ~np.all(keys == 0xFFFFFFFF, axis=0)
    extc9 = np.asarray(table.extc).reshape(9, -1).T[occ]  # bucket-major
    got = {}
    for w0, w1, w2, e in zip(keys[0][occ], keys[1][occ], keys[2][occ], extc9):
        got[(int(w0), int(w1), int(w2))] = int(e[:4].sum() + e[8])
    exp = {}
    for i in range(n):
        key = (int(words[0][i]), int(words[1][i]), int(words[2][i]))
        exp[key] = exp.get(key, 0) + 1
    assert got == exp


def test_ctg_pass_quadratic_schedule():
    """insert_ctg_batch on a quad-schedule table finds read entries placed by
    insert_batch (same schedule) and places new ctg kmers findably."""
    n = 4000
    hi, lo, left, right = _random_records(n, seed=23)
    left = np.minimum(left, 3).astype(np.int32)
    right = np.minimum(right, 3).astype(np.int32)
    table = shard_table.create(2 * n)
    assert table.capacity >= shard_table.QUAD_MIN_CAP
    table = shard_table.insert_batch(
        table, jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(left),
        jnp.asarray(right), jnp.full(n, 2, jnp.int32), jnp.ones(n, bool),
    )
    lut = jnp.asarray(shard_table._dmin_lut(2))
    # ctg kmers: half overlap the read set, half are new
    chi = np.concatenate([hi[: n // 2], hi[n // 2:] ^ np.uint32(0x200)])
    clo = lo.copy()
    table = shard_table.insert_ctg_batch(
        table, jnp.asarray(chi), jnp.asarray(clo), jnp.asarray(left),
        jnp.asarray(right), jnp.full(n, 5, jnp.int32), jnp.ones(n, bool), lut,
    )
    assert int(table.num_dropped) == 0
    # every ctg key must be findable via the query path
    found, counts, _ = lookup_batch(table, jnp.asarray(chi), jnp.asarray(clo))
    assert bool(np.all(np.asarray(found)))


def test_windowed_probe_saturation_accounting():
    """The windowed while_loop (PROBE_WINDOW candidates per round) at table
    saturation: no duplicate keys may ever be stored (the first-interesting-
    candidate jump must never insert ahead of an existing entry), every
    stored key must be one that was inserted, and each valid lane either
    commits exactly one left-bucket increment or is counted dropped."""
    rng = np.random.default_rng(11)
    n = 12000
    hi = rng.integers(0, 1 << 4, n, dtype=np.uint32)
    lo = rng.integers(0, 20000, n, dtype=np.uint32)  # narrow space: duplicates
    left = rng.integers(0, 5, n).astype(np.int32)
    right = rng.integers(0, 5, n).astype(np.int32)
    table = shard_table.create(5000)  # cap ~7577: saturates, forces drops
    assert table.capacity >= shard_table.QUAD_MIN_CAP
    for s in range(3):
        sl = slice(s * 4000, (s + 1) * 4000)
        table = shard_table.insert_batch(
            table, jnp.asarray(hi[sl]), jnp.asarray(lo[sl]),
            jnp.asarray(left[sl]), jnp.asarray(right[sl]),
            jnp.ones(4000, jnp.int32), jnp.ones(4000, bool),
            full_hi_range=False,
        )
    khi = np.asarray(table.keys_hi)
    klo = np.asarray(table.keys_lo)
    occ = (khi != 0xFFFFFFFF) | (klo != 0xFFFFFFFF)
    stored = list(zip(khi[occ].tolist(), klo[occ].tolist()))
    assert len(set(stored)) == len(stored), "duplicate key stored"
    inserted = set(zip(hi.tolist(), lo.tolist()))
    assert set(stored) <= inserted
    extc9 = np.asarray(table.extc).reshape(9, -1).T[occ]
    derived_total = int(extc9[:, :4].sum() + extc9[:, 8].sum())
    dropped = int(table.num_dropped)
    assert dropped > 0  # the scenario must actually exercise exhaustion
    assert derived_total + dropped == n


def test_high_load_program_equivalence():
    """high_load=True/False are alternative tier layouts of the same insert
    protocol: same probe schedule, same commit rules.  The (key -> count,
    ext-bucket) mapping must be identical for any batch sequence (slot
    PLACEMENT may differ only through contention tie-breaks, which the dump
    contract never observes)."""
    n = 9000
    hi, lo, left, right = _random_records(n, seed=5)
    tables = []
    for hl in (False, True):
        t = shard_table.create(int(n * 0.66 / 0.80))
        for s in range(3):
            sl = slice(s * 3000, (s + 1) * 3000)
            t = shard_table.insert_batch(
                t, jnp.asarray(hi[sl]), jnp.asarray(lo[sl]),
                jnp.asarray(left[sl]), jnp.asarray(right[sl]),
                jnp.ones(3000, jnp.int32), jnp.ones(3000, bool),
                full_hi_range=False, high_load=hl,
            )
        assert int(t.num_dropped) == 0
        tables.append(t)
    exp = _expected(hi, lo, left, right)
    for t in tables:
        _check_table(t, exp)


def test_high_load_program_equivalence_mw():
    rng = np.random.default_rng(17)
    n = 9000
    words = rng.integers(0, 1 << 32, (3, n), dtype=np.uint32)
    words[0] &= 0x3  # word-0 narrow like k%16 != 0
    left = rng.integers(0, 5, n).astype(np.int32)
    right = rng.integers(0, 5, n).astype(np.int32)
    exp = {}
    for i in range(n):
        key = tuple(int(words[j][i]) for j in range(3))
        c, e = exp.setdefault(key, [0, [0] * 9])
        e[left[i] if left[i] < 4 else 8] += 1
        if right[i] < 4:
            e[4 + right[i]] += 1
        exp[key][0] += 1
    for hl in (False, True):
        t = shard_table_mw.create(int(n * 0.66 / 0.80), 3)
        for s in range(3):
            sl = slice(s * 3000, (s + 1) * 3000)
            t = shard_table_mw.insert_batch_mw(
                t, jnp.asarray(words[:, sl]), jnp.asarray(left[sl]),
                jnp.asarray(right[sl]), jnp.ones(3000, jnp.int32),
                jnp.ones(3000, bool), w0_full_range=False, high_load=hl,
            )
        assert int(t.num_dropped) == 0
        kw = np.asarray(t.keys).reshape(3, -1)
        occ = ~(kw == 0xFFFFFFFF).all(axis=0)
        extc9 = np.asarray(t.extc).reshape(9, -1).T[occ]
        got = {}
        for idx, e in zip(np.nonzero(occ)[0], extc9):
            key = tuple(int(kw[j][idx]) for j in range(3))
            got[key] = (int(e[:4].sum() + e[8]), list(map(int, e)))
        assert len(got) == len(exp)
        for key, (cnt, e9) in exp.items():
            assert got[key] == (cnt, e9)
