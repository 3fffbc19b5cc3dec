"""KmerDHT — the library-facing distributed k-mer table.

The reference's main API surface is `KmerDHT<MAX_K>`
(src/kcount/kmer_dht.hpp:118-182): construct with a size estimate, feed
supermers (`add_supermer`), `flush_updates`, `finish_updates`, then query
(`get_kmer_count`/`kmer_exists`) and `dump_kmers`.  This facade is the same
contract over the TPU substrate: construct with a mesh + per-shard capacity,
feed read batches (`add_reads` — supermer formation, owner routing, and the
vectorized insert all happen inside the jitted step), `finish_updates` to
finalize, then query and dump.  Every table family is available behind the
same object: k <= 32 / multi-word k > 32, with or without the singleton
filter (`use_qf`), record or supermer wire.

The pipeline (pipeline/analysis.py) drives the same underlying steps with
its own batching/prefetch loop; this class is the stable entry point for
programmatic users.
"""

from __future__ import annotations

import numpy as np

from ..parallel import count_step as cs


class KmerDHT:
    """Distributed k-mer hash table over a device mesh (axis 'sh')."""

    def __init__(self, mesh, k: int, max_elems_per_shard: int, *,
                 use_qf: bool = False, filter_elems_per_shard: int = 0,
                 wire: str = "record", dmin_thres: int = 2,
                 max_rounds: int = 0, m: int | None = None,
                 exchange_cap: int = 0):
        if wire not in ("record", "supermer"):
            raise ValueError(f"wire must be 'record' or 'supermer', got {wire!r}")
        self.mesh = mesh
        self.k = int(k)
        self.n_shards = mesh.shape["sh"]
        self.use_qf = bool(use_qf)
        self.multiword = self.k > 32
        self.wire = wire
        self.dmin_thres = int(dmin_thres)
        self._m = m
        self._max_rounds = int(max_rounds)
        self._cap = int(exchange_cap)
        self._fin = None
        if self.multiword and self.use_qf:
            self._mode = "mwqf"
            self.state = cs.create_sharded_qf_mw(
                self.n_shards, max_elems_per_shard, self.k,
                filter_elems_per_shard or max_elems_per_shard, mesh=mesh)
        elif self.multiword:
            self._mode = "mw"
            self.state = cs.create_sharded_mw(
                self.n_shards, max_elems_per_shard, self.k, mesh=mesh)
        elif self.use_qf:
            self._mode = "qf"
            self.state = cs.create_sharded_qf(
                self.n_shards, max_elems_per_shard,
                filter_elems_per_shard or max_elems_per_shard, mesh=mesh)
        else:
            self._mode = "plain"
            self.state = cs.create_sharded(
                self.n_shards, max_elems_per_shard, mesh=mesh)

    # -- update path --------------------------------------------------------

    def add_reads(self, codes, badq, lengths):
        """Count one read batch: codes [B, L] uint8 (A=0..T=3, >=4 invalid),
        badq [B, L] bool (quality below the cutoff), lengths [B] int32.
        B must be a multiple of the shard count.  The supermer formation,
        minimizer owner routing, exchange, and insert are one jitted step —
        the add_supermer/flush_updates pair of the reference collapses into
        it (updates are visible as soon as the step returns)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..io.packed_reads import ReadBatch

        if self._fin is not None:
            raise RuntimeError("finish_updates() already called")
        from ..parallel import distributed as dist

        codes = np.ascontiguousarray(codes, np.uint8)
        badq = np.ascontiguousarray(badq, bool)
        lengths = np.ascontiguousarray(lengths, np.int32)
        B, L = codes.shape
        # multi-process SPMD: each process passes its OWN rows of the global
        # batch (the per-rank read blocks of the reference); single-process
        # passes the whole batch.  Rows must tile this process's shards.
        n_proc = jax.process_count()
        local_shards = self.n_shards // max(n_proc, 1)
        if B % max(local_shards, 1):
            raise ValueError(
                f"batch rows {B} not a multiple of this process's "
                f"{local_shards} shards"
            )
        B_glob = dist.allsum(B)
        if n_proc > 1 and L != dist.allmax(L):
            raise ValueError("pad read batches to a common max_len across processes")
        cap = self._cap
        if not cap:
            positions = (B_glob // max(self.n_shards, 1)) * L
            if self.wire == "supermer":
                cap = max(positions // (max(self.n_shards, 1) * 3) + 1024, 1024)
            else:
                cap = min(positions, 4 * (positions // max(self.n_shards, 1) + 1) + 4096)
            cap = max(cap, 1)
        step = cs.make_packed_count_step(
            self.mesh, k=self.k, exchange_cap=cap, m=self._m, max_len=L,
            supermers=(self.wire == "supermer" and self.n_shards > 1),
            max_rounds=self._max_rounds, table_mode=self._mode,
        )
        pb = ReadBatch(codes=codes, badq=badq, lengths=lengths).pack()
        sharding = NamedSharding(self.mesh, P("sh"))
        self.state = step(
            self.state,
            dist.make_global(sharding, pb.code2),
            dist.make_global(sharding, pb.nmask),
            dist.make_global(sharding, pb.badq),
            dist.make_global(sharding, pb.lengths),
        )

    def add_read_strings(self, seqs: list, quals: list | None = None,
                         qual_offset: int = 33):
        """Convenience: count reads given as strings (pads to the shard
        count; qualities default to max)."""
        from ..io.packed_reads import encode_batch

        if quals is None:
            quals = ["I" * len(s) for s in seqs]
        pad = -len(seqs) % self.n_shards
        b = encode_batch(list(seqs), list(quals),
                         pad_to=len(seqs) + pad, qual_offset=qual_offset)
        self.add_reads(b.codes, b.badq, b.lengths)

    def finish_updates(self):
        """Finalize: dmin extension calling, purge, device-side compaction
        (the finish_updates/insert_into_local_hashtable pair)."""
        if self._fin is not None:
            return self._fin
        state = self.state.table if self.use_qf else self.state
        fin = (cs.make_finalize_mw if self.multiword else cs.make_finalize)(
            self.mesh, dmin_thres=self.dmin_thres)(state)
        self._fin = fin
        return fin

    # -- read path -----------------------------------------------------------

    def get_kmer_count(self, kmer: str) -> int:
        """Owner-routed point query (get_kmer_count, kmer_dht.cpp:231-245).
        Valid before finalize; counts singletons that are still table- (not
        filter-) resident."""
        return self.get_kmer_counts([kmer])[0]

    def get_kmer_counts(self, kmers: list) -> list:
        from ..table.query import get_kmer_counts_sharded

        return get_kmer_counts_sharded(self.state, kmers, self.k, self.n_shards)

    def kmer_exists(self, kmer: str) -> bool:
        return self.get_kmer_count(kmer) > 0

    def get_kmer_target_rank(self, kmer: str) -> int:
        """Owner shard of a k-mer (minimizer routing, kmer_dht.cpp:193-196)."""
        from ..oracle import canonical_val, kmer_target_shard, kmer_to_val

        cv = canonical_val(kmer_to_val(kmer), self.k)[0]
        return kmer_target_shard(cv, self.k, self.n_shards, self._m)

    def get_num_kmers(self) -> int:
        """Unique k-mers kept after finalize (purges applied)."""
        from ..parallel import distributed as dist

        fin = self.finish_updates()
        return int(dist.fetch(fin.num_kept).sum())

    def get_avg_kmer_count(self) -> float:
        from ..parallel import distributed as dist

        fin = self.finish_updates()
        total = int(dist.fetch(fin.sum_counts).sum())
        kept = int(dist.fetch(fin.num_kept).sum())
        return total / kept if kept else 0.0

    def items(self):
        """Iterate (kmer string, count, left, right) over this process's
        shards of the finalized table."""
        from ..pipeline.analysis import local_fin_shards
        from ..table import shard_table, shard_table_mw as stmw

        fin = self.finish_updates()
        for _, one in local_fin_shards(fin, self.n_shards):
            if self.multiword:
                strings, counts, left, right = stmw.compact_to_host_mw(one, self.k)
            else:
                vals, counts, left, right = shard_table.compact_to_host(one)
                strings = shard_table.vals_to_strings(vals, self.k)
            yield from zip(strings, counts, left, right)

    def dump_kmers(self, output_dir: str):
        """Per-shard kmers-<k>.txt.gz dumps (dump_kmers, kmer_dht.cpp:273-297)."""
        import os

        from ..pipeline.analysis import dump_kmers as _dump

        os.makedirs(os.path.join(output_dir, "per_rank"), exist_ok=True)
        _dump(self.finish_updates(), self.k, output_dir, self.n_shards)
