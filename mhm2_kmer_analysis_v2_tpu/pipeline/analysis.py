"""Pipeline orchestration: ingest -> count -> finalize -> dump/report.

The run_pipeline / contigging / analyze_kmers drivers re-designed for a
single-controller JAX job (reference call stack: src/main.cpp:197-288 ->
src/contigging.cpp:67-192 -> src/kcount/kcount.cpp:142-161).
"""

from __future__ import annotations

import gzip
import os
import time
from dataclasses import dataclass

import jax
import numpy as np

from ..config import Options
from ..contig import utg
from ..io.packed_reads import PackedReads
from ..ops.kmer_ops import minimizer_len_for_k
from ..parallel import count_step as cs
from ..table import shard_table
from ..utils.logging import slog, slog_verbose
from ..utils.timers import stage_timers

BASE_ERROR_RATE = 0.005  # CMakeDefinitions.txt (BASE_ERROR_RATE)


def _make_occ_count(mesh):
    """Occupied-slot counter from one u32 key plane (word 0 / hi): the cheap
    occupancy poll behind the load-adaptive insert switch.  COLLECTIVE-FREE
    by construction — each device reduces its own shard and the host sums
    the per-shard scalars: a replicated jnp.sum would be an all-reduce, and
    XLA:CPU can wedge a fresh collective program's rendezvous against queued
    step collectives even after a drain (observed twice at a 4-device scale
    run's batch-128 poll).  A key whose word 0 is all-ones (k %% 16 == 0
    edge) undercounts slightly — harmless for a switch threshold."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    def per_device(kk):
        return jnp.sum(kk != jnp.uint32(0xFFFFFFFF), dtype=jnp.int64)[None]

    return jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(P("sh", None),), out_specs=P("sh")
    ))


def table_mem_bytes(per_shard_elems: int, k: int, filter_elems: int = 0) -> int:
    """Device bytes one shard's hash table will occupy at the target load
    factor — the hashtable memory estimator of kcount_cpu.cpp:428-444.

    k<=32 slots: keys_hi/lo (8) + counts (4) + extc (36, 9 buckets) + claim
    (4) = 52 B; k>32: 4*W-byte keys instead of 8; filter slots:
    fp+meta+claim = 12 B."""
    from ..ops.kmer_multiword import n_words
    from ..table.shard_table import TARGET_LOAD_FACTOR

    cap = int(per_shard_elems / TARGET_LOAD_FACTOR) + 1
    key_bytes = 8 if k <= 32 else 4 * n_words(k)
    slot = key_bytes + 4 + 36 + 4
    total = cap * slot
    if filter_elems:
        total += (int(filter_elems / TARGET_LOAD_FACTOR) + 1) * 12
    return total


def clamp_elems_to_budget(budget_bytes: int, k: int,
                          filter_ratio: float = 0.0) -> int:
    """Largest per-shard element count whose table (plus a filter of
    filter_ratio * elems entries, for --use-qf) fits budget_bytes.

    filter_ratio is the caller's actual filter:main sizing ratio
    (num_errors / adjusted) — a high-coverage --use-qf run has a filter many
    times the main table, and assuming 1:1 here once "clamped" a 6.5 GB
    request UP to a 10 GB layout (4 GB-input run, depth 45: ratio 4.5)."""
    lo, hi = 1024, 1 << 34
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if table_mem_bytes(mid, k, int(mid * filter_ratio)) <= budget_bytes:
            lo = mid
        else:
            hi = mid - 1
    return lo


# HBM per chip by device_kind prefix, for TPU runtimes that do not expose
# memory_stats() (the tunneled axon plugin returns None).  Override with
# MHM2_TPU_HBM_GB.
_KNOWN_HBM_GB = (
    ("TPU v5 lite", 16),  # v5e
    ("TPU v5e", 16),
    ("TPU v5p", 95),
    ("TPU v4", 32),
    ("TPU v6", 32),  # trillium
)


def _device_mem_budget(frac: float = 0.38) -> int:
    """Usable per-device memory for the table STATE (0 = unknown).  frac
    covers XLA's compile-time peak, not just the resident arrays: at
    reference scale the count step's program allocations measured ~1.34x the
    state on top of it (donated-input copies of extc/keys around the
    cond/while insert protocol), i.e. peak ~2.34x state — a 93M-elem/shard
    table (7.1 GB state) hit "Used 16.32G of 15.75G hbm" on a v5e chip.
    0.38 keeps peak ~<0.9x HBM with margin."""
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"] * frac)
        env_gb = os.environ.get("MHM2_TPU_HBM_GB")
        if env_gb:
            return int(float(env_gb) * 1e9 * frac)
        if dev.platform == "tpu":
            kind = getattr(dev, "device_kind", "") or ""
            for prefix, gb in _KNOWN_HBM_GB:
                if kind.startswith(prefix):
                    return int(gb * 1e9 * frac)
            return int(16e9 * frac)  # conservative default for unknown TPUs
    except Exception:
        pass
    return 0


@dataclass
class AnalysisResult:
    k: int
    unique_kmers: int
    total_kmer_count_sum: int
    avg_kmer_count: float
    num_reads: int
    num_dropped: int
    num_overflow: int
    # per-round wall time and peak-RSS-so-far for this round's CSV row (the
    # reference reports timing per round, src/main.cpp:382-391); defaults keep
    # pre-round-3 result sidecars loadable
    elapsed_s: float = 0.0
    peak_gb: float = 0.0


def _prefetched(items, fn, depth: int):
    """Map fn over items on a feed thread, keeping up to `depth` results in
    flight (double-buffered host->device staging).  depth=0 maps inline."""
    if depth <= 0:
        for it in items:
            yield fn(it)
        return
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    DONE = object()
    stop = threading.Event()

    def put(item) -> bool:
        # bounded put that gives up when the consumer is gone, so an
        # exception in the consumer (e.g. device OOM mid-step) can't leave
        # the feed thread blocked forever holding staged batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for it in items:
                if not put(fn(it)):
                    return
            put(DONE)
        except BaseException as e:  # propagate into the consumer
            put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drop any staged batches so their host/device memory is released
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join()


_WIRE_PROBE_CACHE: dict = {}


def _probe_wire_choice(mesh, *, k: int, m: int, max_len: int, batch: int,
                       n_shards: int, max_rounds: int, table_mode: str) -> bool:
    """Measure ONE synthetic batch through each wire on a small throwaway
    table and pick the faster (True = supermer).  Table-op cost is flat in
    capacity (BASELINE speed-of-light model), so a small-capacity probe is
    representative; both wires are bit-exact so the choice is unobservable.
    Cached per configuration for the run's later k-rounds."""
    key = (tuple(np.ravel(mesh.devices).tolist()), k, m, max_len, batch,
           n_shards, table_mode)
    if key in _WIRE_PROBE_CACHE:
        return _WIRE_PROBE_CACHE[key]
    probe_t0 = time.perf_counter()
    from ..io.packed_reads import ReadBatch
    from ..parallel import distributed as dist

    n_proc = jax.process_count()
    local_rows = batch // n_proc
    rng = np.random.default_rng(1234 + jax.process_index())
    codes = rng.integers(0, 4, (local_rows, max_len), dtype=np.uint8)
    pb = ReadBatch(
        codes=codes,
        badq=np.zeros((local_rows, max_len), bool),
        lengths=np.full((local_rows,), max_len, np.int32),
    ).pack()
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("sh"))
    dev_args = (
        dist.make_global(sharding, pb.code2),
        dist.make_global(sharding, pb.nmask),
        dist.make_global(sharding, pb.badq),
        dist.make_global(sharding, pb.lengths),
    )
    positions_per_device = (batch // n_shards) * max_len
    timings = {}
    for supermers in (False, True):
        if supermers:
            cap = max(positions_per_device // (n_shards * 3) + 1024, 1024)
        else:
            mean = positions_per_device // max(n_shards, 1) + 1
            cap = min(positions_per_device, 4 * mean + 4096)
        step = cs.make_packed_count_step(
            mesh, k=k, exchange_cap=cap, m=m, max_len=max_len,
            supermers=supermers, max_rounds=max_rounds, table_mode=table_mode,
        )
        probe_elems = 1 << 18  # small table: op cost is per-lane, not per-slot
        if table_mode == "mwqf":
            st = cs.create_sharded_qf_mw(n_shards, probe_elems, k, probe_elems, mesh=mesh)
        elif table_mode == "mw":
            st = cs.create_sharded_mw(n_shards, probe_elems, k, mesh=mesh)
        elif table_mode == "qf":
            st = cs.create_sharded_qf(n_shards, probe_elems, probe_elems, mesh=mesh)
        else:
            st = cs.create_sharded(n_shards, probe_elems, mesh=mesh)
        st = step(st, *dev_args)  # compile + warmup
        np.asarray(jax.tree.leaves(st)[-1].addressable_shards[0].data)
        t0 = time.perf_counter()
        st = step(st, *dev_args)
        np.asarray(jax.tree.leaves(st)[-1].addressable_shards[0].data)
        dt = time.perf_counter() - t0
        # all processes must agree: use the max (slowest process paces a run)
        timings[supermers] = dist.allstats(dt)[3]
        del st
    choice = timings[True] < timings[False]
    slog(
        "Wire probe: record ", f"{timings[False] * 1e3:.0f}", " ms, supermer ",
        f"{timings[True] * 1e3:.0f}", " ms per batch -> using ",
        "supermer" if choice else "record", " wire (probe cost ",
        f"{time.perf_counter() - probe_t0:.1f}", " s incl. compiles)",
    )
    _WIRE_PROBE_CACHE[key] = choice
    return choice


def load_reads(options: Options) -> PackedReads:
    """Ingest all read groups: adapter trim + pair merge -> PackedReads
    (the merge_reads stage, src/main.cpp:209-215, src/merge_reads.cpp:250)."""
    from ..io.ingest import load_and_merge_reads

    stage_timers.merge_reads.start()
    pr, _ = load_and_merge_reads(options)
    stage_timers.merge_reads.stop()
    slog_verbose("Loaded ", len(pr), " reads, ", pr.bases, " bases, max len ", pr.max_read_len)
    return pr




def analyze_kmers(
    pr: PackedReads,
    k: int,
    options: Options,
    mesh=None,
    prev_ctgs=None,
) -> tuple[AnalysisResult, shard_table.FinalizedShard, int]:
    """One k-round: count all reads' k-mers on the mesh (optionally followed
    by the previous round's contig k-mers), finalize, report."""
    from ..parallel import distributed as dist

    if mesh is None:
        mesh = cs.make_mesh(options.n_devices or None)
    n_shards = mesh.shape["sh"]
    n_proc = jax.process_count()
    m = minimizer_len_for_k(k)
    slog_verbose("Using a minimizer length of ", m)

    est_kmers = dist.allsum(pr.estimate_num_kmers(k))
    multiword = k > 32
    # --use-qf works for every k: like the reference's TCF, the filter keys
    # on a hash of the full k-mer (gpu_hash_table.cpp:441-446)
    use_qf = options.use_qf
    adjusted = est_kmers // max(options.sequencing_depth, 1)
    kmer_error_rate = 1.0 - (1.0 - BASE_ERROR_RATE) ** k
    num_errors = int(est_kmers * kmer_error_rate)
    if use_qf:
        # main table sized WITHOUT error-kmer headroom; errors go to the
        # filter (gpu_hash_table.cpp:552-557)
        per_shard = max(adjusted, 1024) // n_shards + 1024
        filter_per_shard = max(num_errors, 1024) // n_shards + 1024
    else:
        per_shard = max(adjusted + num_errors, 1024) // n_shards + 1024
        filter_per_shard = 0
    # hashtable memory estimate + HBM-budget clamp (the free-memory-budgeted
    # sizing of src/kcount/kcount_cpu.cpp:428-470 / gpu_hash_table.cpp:552)
    est_mb = table_mem_bytes(per_shard, k, filter_per_shard) / 1e6
    budget = _device_mem_budget()
    slog_verbose(
        "Hash table sizing: ", per_shard, " elems/shard, est ",
        f"{est_mb:.1f}", " MB/shard device memory",
        f" (budget {budget / 1e6:.0f} MB)" if budget else "",
    )
    if budget and table_mem_bytes(per_shard, k, filter_per_shard) > budget:
        clamped = clamp_elems_to_budget(
            budget, k, filter_per_shard / per_shard if filter_per_shard else 0.0)
        clamped = min(clamped, per_shard)  # clamp only ever shrinks
        scale = clamped / per_shard
        slog(
            "WARNING: clamping per-shard table capacity ", per_shard, " -> ",
            clamped, " to fit the ", f"{budget / 1e9:.2f}",
            " GB device memory budget; overflow k-mers will be dropped and "
            "counted if the estimate was right",
        )
        per_shard = clamped
        filter_per_shard = int(filter_per_shard * scale)
        if use_qf:
            # the QF estimate divides by --sequencing-depth (default 4): on
            # high-coverage inputs it overshoots uniques ~10x, the clamp
            # fires, and the SCALED filter is what overflows (every first
            # occurrence passes through it) — the flag is the sizing control
            slog(
                "WARNING: --use-qf filter scaled to ", filter_per_shard,
                " elems/shard by the budget clamp; if coverage is higher than"
                " --sequencing-depth ", options.sequencing_depth,
                " the filter will overflow and drop — set --sequencing-depth"
                " near the input's real average k-mer depth",
            )
    if multiword and use_qf:
        state = cs.create_sharded_qf_mw(n_shards, per_shard, k,
                                        filter_per_shard, mesh=mesh)
    elif multiword:
        state = cs.create_sharded_mw(n_shards, per_shard, k, mesh=mesh)
    elif use_qf:
        state = cs.create_sharded_qf(n_shards, per_shard, filter_per_shard, mesh=mesh)
    else:
        state = cs.create_sharded(n_shards, per_shard, mesh=mesh)
    slog_verbose("Initial counts for read kmers ", est_kmers, " num errors ", num_errors)

    batch = options.batch_reads
    # round batch to a multiple of shard count so every device gets equal rows
    batch = max(n_shards, batch - batch % n_shards)
    max_len = dist.allmax(max(pr.max_read_len, k + 2))
    positions_per_device = (batch // n_shards) * max_len
    # exchange capacity: sized just above the per-destination MEAN (the
    # fixed-capacity analogue of --max-kmer-store sizing, kmer_dht.cpp:141-144);
    # an explicit --max-kmer-store (MB/rank) caps the per-destination buffer.
    # The receiver processes n_shards*cap lanes per round, so cap headroom
    # multiplies insert work directly: the old 4x-mean sizing made the n=2
    # step 2.08x the insert-only cost vs 1.19x at 1.25x-mean, with zero spill
    # rounds either way on route_hash-balanced destinations
    # (scripts/exp_exchange.py; skew beyond the margin spills losslessly).
    mean = positions_per_device // max(n_shards, 1) + 1
    exchange_cap = (
        min(positions_per_device, mean + mean // 4 + 1024) if n_shards > 1 else 1
    )
    if options.max_kmer_store_mb > 0 and n_shards > 1:
        record_bytes = 12  # hi + lo + meta words
        cap_from_store = options.max_kmer_store_mb * (1 << 20) // (record_bytes * n_shards)
        exchange_cap = max(min(exchange_cap, cap_from_store), 1024)

    # --max-rpcs-in-flight bounds exchange spill rounds per batch (the
    # in-flight-RPC cap analogue, src/options.cpp:294); 0 = unbounded
    max_rounds = max(options.max_rpcs_in_flight, 0)
    # Losslessness floor: with bounded rounds, worst-case skew (every record
    # bound for ONE destination) needs ceil(positions_per_device / cap)
    # rounds; floor the cap so that fits in the budget and overflow drops
    # can't happen at the default settings (the reference's store never
    # silently loses under backpressure, src/kcount/kmer_dht.cpp:247-258).
    if max_rounds > 0 and n_shards > 1:
        exchange_cap = max(exchange_cap, -(-positions_per_device // max_rounds))
    # bit-packed h2d (0.5 B/base + masks on the wire) for every table family
    if multiword:
        table_mode = "mwqf" if use_qf else "mw"
    else:
        table_mode = "qf" if use_qf else "plain"
    # --wire picks the multi-shard exchange format: supermer compresses bytes
    # 2-3x (wins only if the interconnect is the bottleneck, i.e. multi-host
    # DCN) at the cost of receiver-side window re-extraction; record skips
    # the recompute.  The record wire won EVERY measured configuration even
    # after the r5 receiver compaction (n=2 per-device 2.34M vs 0.52M,
    # BASELINE.md round-5 crossover table), so `auto` now just uses record
    # and the supermer wire is EXPERIMENTAL: select it explicitly with
    # --wire supermer (untested-on-DCN compression play), or set
    # MHM2_TPU_WIRE_PROBE=1 to restore the measured one-batch probe
    # (costs two extra compiles of the supermer program).
    import os as _os

    if (options.wire == "auto" and n_shards > 1
            and _os.environ.get("MHM2_TPU_WIRE_PROBE", "") == "1"):
        use_supermers = _probe_wire_choice(
            mesh, k=k, m=m, max_len=max_len, batch=batch, n_shards=n_shards,
            max_rounds=max_rounds, table_mode=table_mode,
        )
    else:
        use_supermers = (options.wire == "supermer") and n_shards > 1
    if use_supermers:
        # cap is in supermers per destination; per-round cost is
        # proportional to the CAP (padding is processed), so size near
        # the MEAN supermer count (~4-6 kmers/supermer) — the lossless
        # spill rounds absorb skew, no 4x headroom needed
        exchange_cap = max(positions_per_device // (n_shards * 3) + 1024, 1024)
    step_kw = dict(
        mesh=mesh, k=k, exchange_cap=exchange_cap, m=m, max_len=max_len,
        supermers=use_supermers, max_rounds=max_rounds, table_mode=table_mode,
    )
    step = cs.make_packed_count_step(**step_kw)
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("sh"))

    from ..utils.comm_stats import comm_stats

    comm_stats.begin_stage(f"analyze_kmers k={k}")
    stage_timers.analyze_kmers.start()
    profiling = bool(getattr(options, "xprof_dir", ""))
    if profiling:
        jax.profiler.start_trace(options.xprof_dir)
    num_reads = 0
    total_reads = len(pr)
    # per-batch first-round all_to_all bytes (formula bookkeeping; spill
    # rounds add real traffic and MHM2_TPU_HLO_COMM=1 gives the compiled
    # shapes): planes depend on wire and table family
    if use_supermers:
        bw_, mw_, _ = cs._supermer_words(k, cs.SUPERMER_MAX_RUN)
        n_planes = bw_ + mw_ + 1
    elif multiword:
        from ..ops.kmer_multiword import n_words as _nw

        n_planes = _nw(k) + 1
    else:
        n_planes = 3
    a2a_bytes = n_planes * n_shards * n_shards * exchange_cap * 4 if n_shards > 1 else 0
    # every process feeds its own block's rows; the batch LOOP runs in
    # lockstep across processes (compiled steps are launched SPMD), so the
    # trip count is the max over processes and stragglers feed empty batches
    local_rows = batch // n_proc
    n_batches = dist.allmax(max(1, -(-total_reads // local_rows)))

    def host_batches():
        batch_iter = pr.batches(local_rows, max_len=max_len)
        empty_rb = None
        for _ in range(n_batches):
            rb = next(batch_iter, None)
            if rb is None:
                if empty_rb is None:
                    empty_rb = pr.slice_batch(0, 0, max_len, pad_to=local_rows)
                rb = empty_rb
            yield rb

    def stage_pack(rb):
        """Host-side encode/pack for one batch (runs on the feed thread so it
        overlaps the previous batch's device step — the thread-pool overlap of
        src/kcount/kcount_gpu.cpp:118-133).  Pure numpy: safe on a thread in
        every process count."""
        n_real = int((rb.lengths > 0).sum())
        return n_real, rb.pack()

    def to_device(pb):
        return (
            dist.make_global(sharding, pb.code2),
            dist.make_global(sharding, pb.nmask),
            dist.make_global(sharding, pb.badq),
            dist.make_global(sharding, pb.lengths),
        )

    # MHM2_TPU_NO_FEED_THREAD=1 serializes the feed (A/B measurement knob for
    # the overlap win; see BASELINE.md)
    depth = 0 if os.environ.get("MHM2_TPU_NO_FEED_THREAD") else 2
    if n_proc == 1 and jax.default_backend() != "cpu":
        # single process on a real accelerator: the h2d staging itself also
        # rides the feed thread (overlapping the 3 MB/s tunnel transfer with
        # device steps is the measured 10x e2e win, BASELINE.md)
        def stage_full(rb):
            n_real, pb = stage_pack(rb)
            return n_real, pb.nbytes, to_device(pb)

        feed = _prefetched(host_batches(), stage_full, depth)
    else:
        # multi-process, and any XLA:CPU run: the numpy pack overlaps on the
        # feed thread, but make_global (a collective-ordering point) and the
        # step launch stay on the main thread.  Multi-process needs this so
        # every process interleaves its collectives identically (VERDICT r2
        # item 4).  XLA:CPU needs it because a device_put racing an in-flight
        # collective step wedges the 8-thread all-reduce rendezvous (observed
        # at reference scale: id-7 never joins, every thread parks on a futex;
        # the minimal repro with main-thread transfers runs the identical
        # shapes clean).
        def feed_gen():
            for n_real, pb in _prefetched(host_batches(), stage_pack, depth):
                yield n_real, pb.nbytes, to_device(pb)

        feed = feed_gen()
    # MHM2_TPU_HLO_COMM=1 cross-checks the formula bookkeeping against the
    # compiled program (the GASNET_STATSFILE-style env activation,
    # src/main.cpp:414-420): capture arg shapes once, report after the loop
    hlo_args = None
    want_hlo = bool(os.environ.get("MHM2_TPU_HLO_COMM"))
    # periodic log waypoints for long runs (the ProgressBar analogue,
    # upcxx_utils; stdout --progress is separate)
    log_every = max(1, n_batches // 10)
    batch_i = 0
    # count-loop decomposition (VERDICT r3 weak #1): always-on wall split of
    # the loop into feed-wait (host pack + h2d when the feed can't hide them)
    # vs step-wait (dispatch; blocks here when the device is the bottleneck).
    # MHM2_TPU_TIME_BATCHES=1 additionally syncs after every step for exact
    # per-batch device times (perturbs the overlap; diagnosis only).
    sync_batches = bool(os.environ.get("MHM2_TPU_TIME_BATCHES"))
    t_feed = t_step = 0.0
    batch_secs = []
    # load-adaptive insert program: poll main-table occupancy at doubling
    # batch indices (a one-plane device reduce, a few scalars D2H) and
    # switch to the loaded-tier insert layout past shard_table.HIGH_LOAD_SWITCH
    # load — the cheap
    # cascade's R/8 tier overflows there and every batch pays the full-width
    # fallback (shard_table.insert_batch docstring; scripts/exp_gap.py).
    # Poll indices are fixed, so multi-process loops stay lockstep.
    # MHM2_TPU_HIGH_LOAD: auto (poll + switch, default) | 1 (loaded-tier
    # program from batch 0) | 0 (never switch) — A/B knob for scale runs
    _hl_force = os.environ.get("MHM2_TPU_HIGH_LOAD", "auto")
    high_load_on = _hl_force != "auto"
    if _hl_force == "1":
        step = cs.make_packed_count_step(**step_kw, high_load=True)
    _occ_fn = None if high_load_on else _make_occ_count(mesh)
    # periodic sync interval for XLA:CPU multi-device (0 = never);
    # MHM2_TPU_CPU_SYNC_EVERY overrides
    cpu_sync_every = 0
    if jax.default_backend() == "cpu" and n_shards > 1:
        cpu_sync_every = int(os.environ.get("MHM2_TPU_CPU_SYNC_EVERY", "8"))
    next_poll = 8

    def _main_keys_w0(st_):
        if table_mode == "plain":
            return st_.keys_hi
        if table_mode == "qf":
            return st_.table.keys_hi
        if table_mode == "mw":
            return st_.keys[:, : st_.keys.shape[1] // nw_]
        return st_.table.keys[:, : st_.table.keys.shape[1] // nw_]

    nw_ = 0
    if multiword:
        from ..ops.kmer_multiword import n_words as _nw_fn

        nw_ = _nw_fn(k)
    cap_per_shard = int(_main_keys_w0(state).shape[-1])
    feed_it = iter(feed)
    while True:
        _t0 = time.perf_counter()
        item = next(feed_it, None)
        t_feed += time.perf_counter() - _t0
        if item is None:
            break
        n_real, nbytes, dev_args = item
        if options.show_progress and total_reads:
            pct = 100 * num_reads // total_reads
            print(f"\rProcessing reads to count kmers: {pct}% ", end="", flush=True)
        batch_i += 1
        if n_batches >= 20 and batch_i % log_every == 0:
            slog_verbose("  counted batch ", batch_i, " of ", n_batches)
        num_reads += n_real
        comm_stats.add_h2d(nbytes)
        comm_stats.add_collective(a2a_bytes, 3 if n_shards > 1 else 0)
        if want_hlo and hlo_args is None:
            hlo_args = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                (state,) + tuple(dev_args),
            )
        _t0 = time.perf_counter()
        state = step(state, *dev_args)
        if sync_batches:
            jax.block_until_ready(state.num_dropped)
            batch_secs.append(time.perf_counter() - _t0)
        elif cpu_sync_every and batch_i % cpu_sync_every == 0:
            # XLA:CPU multi-device: bound the async dispatch depth — deep
            # queues of collective programs can wedge the rendezvous pool
            # (observed repeatedly on 4-device --use-qf scale runs; TPU runs
            # are unaffected and keep full pipelining)
            jax.block_until_ready(_main_keys_w0(state))
        t_step += time.perf_counter() - _t0
        if not high_load_on and batch_i == next_poll:
            next_poll *= 2
            # drain in-flight steps before the poll: the occupancy sum over a
            # sharded table is an all-reduce, and XLA:CPU wedges its
            # rendezvous when a NEW collective program races queued step
            # collectives (the r3 feed-thread deadlock family; observed once
            # at batch 128 of a 4-device --use-qf scale run)
            jax.block_until_ready(_main_keys_w0(state))
            occ = int(dist.fetch(_occ_fn(_main_keys_w0(state))).sum())
            if occ > shard_table.HIGH_LOAD_SWITCH * cap_per_shard * n_shards:
                high_load_on = True
                slog_verbose(
                    "  switching to the loaded-tier insert at batch ", batch_i,
                    " (occupancy ", occ, " of ", cap_per_shard * n_shards, ")",
                )
                step = cs.make_packed_count_step(**step_kw, high_load=True)
    if hlo_args is not None:
        from ..utils.comm_stats import hlo_report

        # same shapes as the executed step: compile is a cache hit (in-process
        # or the persistent compilation cache), so this only re-traces
        txt = step.lower(*hlo_args).compile().as_text()
        slog_verbose(hlo_report(txt, f"count step k={k}"))
    if options.show_progress:
        print("\rProcessing reads to count kmers: 100%")
    num_reads = dist.allsum(num_reads)

    # contig-kmer pass (add_ctg_kmers) — all table modes: single-word,
    # multi-word (insert_ctg_batch_mw), and --use-qf (the pass runs against
    # the QF main table; a filter-resident read singleton is simply absent
    # there, and a fresh ctg insert {depth, from_ctg, exts} is the SAME entry
    # the count==1 overwrite rule would produce, so only the QF mode's
    # documented count-variation caveats apply, no new divergence)
    _t_ctg0 = time.perf_counter()
    if prev_ctgs:
        from ..io.packed_reads import encode_batch

        # long contigs are split into fixed windows with k+1-base overlap:
        # window interiors tile the contig's counted positions exactly (each
        # window skips its first/last k-mer like any sequence; the overlap
        # makes the neighbor's interior cover them) — the fixed-block analogue
        # of the reference's 3 MB seq blocks (KCOUNT_SEQ_BLOCK_SIZE)
        WC = max(max_len, 512)
        # ctg batches use fewer ROWS so per-batch device lanes match the read
        # loop's (batch rows x max_len): a [8192, 512] window batch is 3.4x
        # the read batch's lanes, and its sort/extc temps RESOURCE_EXHAUSTed
        # next to the budget-clamped 6 GB k=33 table on a 16 GB chip (1.2 GB
        # multi-k run) — the read loop's lane count is the proven envelope
        ctg_batch = max(n_shards, (batch * max_len // WC) // n_shards * n_shards)
        # the ctg pass exchanges per-k-mer records: size its own capacity
        # near the mean like the read pass (spill rounds absorb skew)
        ctg_positions = (ctg_batch // n_shards) * WC
        ctg_mean = ctg_positions // n_shards + 1
        ctg_cap = (
            min(ctg_positions, ctg_mean + ctg_mean // 4 + 1024)
            if n_shards > 1 else 1
        )
        ctg_kw = dict(k=k, exchange_cap=ctg_cap, dmin_thres=options.dmin_thres,
                      m=m, max_rounds=max_rounds)
        inner_ctg = (cs.make_ctg_step_mw if multiword else cs.make_ctg_step)(
            mesh, **ctg_kw
        )
        if use_qf:
            # the ctg pass runs against the main table only (filter-resident
            # read singletons are simply absent there — see block comment)
            def ctg_step(st_, *args):
                return st_._replace(table=inner_ctg(st_.table, *args))
        else:
            ctg_step = inner_ctg
        ctg_pairs = (
            zip(prev_ctgs.seqs, prev_ctgs.depths)
            if hasattr(prev_ctgs, "seqs") else prev_ctgs
        )
        seqs, depths = [], []
        for s, d in ctg_pairs:
            if len(s) < k + 2:
                continue
            dd = max(1, min(int(round(d)), 65535))
            step_w = WC - (k + 1)
            for lo in range(0, max(len(s) - (k + 1), 1), step_w):
                seqs.append(s[lo : lo + WC])
                depths.append(dd)
        if not getattr(prev_ctgs, "local", False):
            # replicated contig set (host-gather traversal / restart load):
            # each process inserts a disjoint round-robin slice, lockstep like
            # the read loop.  Local contig sets (the scalable device
            # traversal) are already disjoint per process.
            rank = jax.process_index()
            seqs = seqs[rank::n_proc]
            depths = depths[rank::n_proc]
        cb = ctg_batch // n_proc  # this process's rows of the global batch
        n_cbatches = dist.allmax(max(1, -(-len(seqs) // cb)) if seqs else 1)
        if cpu_sync_every:
            # XLA:CPU multi-device: drain the read-step queue before issuing
            # the ctg-pass programs, and bound their async depth like the
            # read loop — ~20 queued collective programs of a NEW executable
            # wedged the rendezvous pool at the k=33 ctg pass of a 4-device
            # --use-qf scale run (2 of 4 device threads never joined)
            jax.block_until_ready(_main_keys_w0(state))
        for bi in range(n_cbatches):
            lo = bi * cb
            chunk = seqs[lo : lo + cb]
            eb = encode_batch(chunk, ["K" * len(s) for s in chunk], max_len=WC, pad_to=cb)
            dep = np.zeros((cb,), np.int32)
            dep[: len(chunk)] = depths[lo : lo + cb]
            state = ctg_step(
                state,
                dist.make_global(sharding, eb.codes),
                dist.make_global(sharding, eb.badq),
                dist.make_global(sharding, eb.lengths),
                dist.make_global(sharding, dep),
            )
            if cpu_sync_every and (bi + 1) % cpu_sync_every == 0:
                jax.block_until_ready(_main_keys_w0(state))

    # flush_updates + finish_updates
    _t0 = time.perf_counter()
    t_ctg = _t0 - _t_ctg0
    if use_qf:
        n_singleton = int(dist.fetch(state.f_stored).sum())
        slog_verbose("Singleton filter stored ", n_singleton, " first occurrences")
        state = state.table  # finalize the main table only
    # every state read happens BEFORE finalize: the state is donated into it
    # (at reference scale ~6 GB/chip of table arrays must be reusable as
    # finalize's outputs/temps or a 16 GB chip RESOURCE_EXHAUSTs)
    num_dropped = int(dist.fetch(state.num_dropped).sum())
    t_drain = time.perf_counter() - _t0
    num_overflow = int(dist.fetch(state.overflow).sum())
    num_spill = int(dist.fetch(state.spill_rounds).max())
    # probe-length / load-factor report (flush_inserts, kcount_cpu.cpp:496-521)
    # — always-on for every table family and process count: the reduction runs
    # on device and pulls only a few scalars per shard (the r2 version pulled
    # the full key arrays and was gated to verbose+single-process+shard 0)
    _t0 = time.perf_counter()
    if multiword:
        from ..table.shard_table_mw import probe_stats_device_mw
        from ..ops.kmer_multiword import n_words as _nwords

        pstats = probe_stats_device_mw(state.keys, _nwords(k))
    else:
        from ..table.shard_table import probe_stats_device

        pstats = probe_stats_device(state.keys_hi, state.keys_lo)
    pstats = {kk: np.asarray(v) for kk, v in pstats.items()}  # before donation
    t_probe = time.perf_counter() - _t0
    _t0 = time.perf_counter()
    if multiword:
        finalize = cs.make_finalize_mw(mesh, dmin_thres=options.dmin_thres,
                                       donate=True)
    else:
        finalize = cs.make_finalize(mesh, dmin_thres=options.dmin_thres,
                                    donate=True)
    fin = finalize(state)
    del state
    # compact the finalized table on device before ANY host fetch: d2h then
    # moves ~12 B per kept k-mer, not ~21 B per slot of capacity (the bulk
    # compact-table D2H of gpu_hash_table.cpp:736-784) — dominant e2e cost
    # through a slow host link otherwise
    kept_max = int(dist.allmax(int(dist.fetch(fin.num_kept).max())))
    t_finalize = time.perf_counter() - _t0
    _t0 = time.perf_counter()
    K = max(1 << 16, -(-kept_max // (1 << 16)) * (1 << 16))
    if K < fin.keep.shape[-1]:
        compact = (cs.make_compact_fin_mw if multiword else cs.make_compact_fin)(
            mesh, K, donate=True)
        fin = compact(fin)
        jax.block_until_ready(fin.keep)
    t_compact = time.perf_counter() - _t0
    if profiling:
        jax.profiler.stop_trace()
    stage_timers.analyze_kmers.stop()
    comm_stats.end_stage()
    slog(
        "  count-stage decomposition (s): feed_wait ", f"{t_feed:.1f}",
        " step_wait ", f"{t_step:.1f}", " drain ", f"{t_drain:.1f}",
        " ctg_pass ", f"{t_ctg:.1f}", " probe_stats ", f"{t_probe:.1f}",
        " finalize ", f"{t_finalize:.1f}", " compact ", f"{t_compact:.1f}",
        " (", batch_i, " batches)",
    )
    if batch_secs:
        bs = np.asarray(batch_secs)
        qs = np.percentile(bs, [0, 25, 50, 75, 100])
        slog(
            "  per-batch device step (synced, s): min/q1/med/q3/max ",
            "/".join(f"{q:.2f}" for q in qs),
            "  first5 ", "/".join(f"{q:.2f}" for q in bs[:5]),
            "  last5 ", "/".join(f"{q:.2f}" for q in bs[-5:]),
        )
    occ = pstats["occupied"]
    if occ.sum() > 0:
        wavg = float((pstats["avg_probe"] * occ).sum() / occ.sum())
        slog_verbose(
            "  load factor: ", f"{float(pstats['load_factor'].mean()):.3f}",
            " avg / ", f"{float(pstats['load_factor'].max()):.3f}",
            " max, probe lengths: ", f"{wavg:.2f}", " avg, ",
            int(pstats["max_probe"].max()), " max (", len(occ), " shards)",
        )

    unique = int(dist.fetch(fin.num_kept).sum())
    total_sum = int(dist.fetch(fin.sum_counts).sum())
    avg_count = total_sum / unique if unique else 0.0
    # shard load balance (the supermer-insert balance report,
    # src/kcount/kcount.cpp:97-100)
    per_shard_kept = dist.fetch(fin.num_kept)
    if n_shards > 1 and per_shard_kept.max() > 0:
        slog_verbose(
            "Avg kmers per shard ", int(per_shard_kept.mean()), " max ",
            int(per_shard_kept.max()), " load balance ",
            f"{per_shard_kept.mean() / per_shard_kept.max():.3f}",
        )
    if num_dropped:
        slog("WARNING: ", num_dropped, " kmers dropped (probe cap/table full)")
    if num_spill:
        slog_verbose("Exchange ran ", num_spill, " spill round(s) beyond the first ",
                     "(skewed minimizer distribution vs capacity)")
    if num_overflow:
        slog("WARNING: ", num_overflow,
             " records lost: --max-rpcs-in-flight capped the spill rounds")
    slog_verbose("Total kmers: ", unique)
    slog_verbose("Total kmer count sum: ", total_sum)
    res = AnalysisResult(
        k=k,
        unique_kmers=unique,
        total_kmer_count_sum=total_sum,
        avg_kmer_count=avg_count,
        num_reads=num_reads,
        num_dropped=num_dropped,
        num_overflow=num_overflow,
    )
    return res, fin, n_shards


def local_fin_shards(fin, n_shards: int):
    """Yield (global_shard_index, FinalizedShard-of-numpy) for the shards this
    process owns (all of them when single-process)."""
    from ..utils.comm_stats import comm_stats

    if jax.process_count() == 1:
        for shard in range(n_shards):
            one = type(fin)(*[np.asarray(x)[shard] for x in fin])
            comm_stats.add_d2h(sum(a.nbytes for a in one))
            yield shard, one
        return
    from ..parallel import distributed as dist

    fields = [dict(dist.local_shard_items(x)) for x in fin]
    for shard in sorted(fields[0]):
        one = type(fin)(*[f[shard] for f in fields])
        comm_stats.add_d2h(sum(a.nbytes for a in one))
        yield shard, one


def count_histogram(fin, n_shards: int) -> dict:
    """count -> number of distinct kept k-mers (the BASELINE parity metric);
    reduced across processes (counts saturate at uint16 so a dense 64Ki
    array carries the cross-process sum)."""
    from ..parallel import distributed as dist

    arr = np.zeros((65536,), np.int64)
    for _, one in local_fin_shards(fin, n_shards):
        keep = np.asarray(one.keep)
        counts = np.asarray(one.counts)[keep]
        vals, freqs = np.unique(counts, return_counts=True)
        arr[vals] += freqs
    arr = dist.allsum_array(arr)
    return {int(c): int(n) for c, n in enumerate(arr) if n}


def write_histogram(hist: dict, k: int, output_dir: str):
    with open(os.path.join(output_dir, f"kmer-histogram-{k}.txt"), "w") as f:
        for c in sorted(hist):
            f.write(f"{c} {hist[c]}\n")


def _dump_codes(one, k: int):
    """(codes [n,k] u8 0..3, counts, left chars, right chars) for one
    finalized shard, sorted by k-mer — the dump record plane without
    materializing per-record Python strings."""
    from ..ops.kmer_multiword import n_words
    from ..table import shard_table_mw as stmw

    if k <= 32:
        vals, counts, left, right = shard_table.compact_to_host(one)
        shifts = (2 * (k - 1 - np.arange(k))).astype(np.uint64)
        codes = ((vals[:, None] >> shifts[None, :]) & np.uint64(3)).astype(np.uint8)
        return codes, counts, left, right
    keep = np.asarray(one.keep)
    words = [np.asarray(one.keys[j])[keep] for j in range(one.keys.shape[0])]
    counts = np.asarray(one.counts)[keep]
    left = shard_table._EXT_CHARS[np.asarray(one.left_ext)[keep]]
    right = shard_table._EXT_CHARS[np.asarray(one.right_ext)[keep]]
    order = np.lexsort(tuple(reversed(words)))
    Wn = n_words(k)
    r = k - 16 * (Wn - 1)
    cols = []
    for j, width in enumerate([r] + [16] * (Wn - 1)):
        w = words[j][order].astype(np.uint32)
        shifts = (2 * (width - 1 - np.arange(width))).astype(np.uint32)
        cols.append(((w[:, None] >> shifts[None, :]) & np.uint32(3)).astype(np.uint8))
    return np.concatenate(cols, axis=1), counts[order], left[order], right[order]


def _write_gz_parallel(path: str, text: bytes, level: int = 1,
                       chunk: int = 16 << 20):
    """gzip-compress `text` as independent members in parallel threads and
    write them in order (a concatenation of gzip members is a valid gzip
    stream; readers see one continuous text).  zlib releases the GIL, so
    this parallelizes across host cores like the reference's concurrent
    per-rank dumps (src/kcount/kmer_dht.cpp:273-297)."""
    import zlib
    from concurrent.futures import ThreadPoolExecutor

    spans = [text[i:i + chunk] for i in range(0, max(len(text), 1), chunk)]

    def _member(b: bytes) -> bytes:
        co = zlib.compressobj(level, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return co.compress(b) + co.flush()

    with ThreadPoolExecutor(max_workers=min(8, len(spans))) as ex:
        members = list(ex.map(_member, spans))
    with open(path, "wb") as f:
        for m in members:
            f.write(m)


def dump_kmers(fin, k: int, output_dir: str, n_shards: int):
    """Write per-shard kmers-<k>.txt.gz dumps, 'KMER count L R' lines
    (src/kcount/kmer_dht.cpp:269-297); each process writes its own shards.

    Formatting runs in the native OpenMP formatter and compression in
    parallel gzip members — the r4 k=55 chip run spent ~1,500 s in the
    per-record Python loop + single-threaded gzip on 25.8M records."""
    from ..io.native import format_dump_native

    for shard, one in local_fin_shards(fin, n_shards):
        codes, counts, left, right = _dump_codes(one, k)
        path = os.path.join(output_dir, "per_rank", f"kmers-{k}.txt.gz.{shard}")
        text = format_dump_native(codes, counts, left, right)
        if text is not None:
            _write_gz_parallel(path, text)
            continue
        # pure-Python fallback (no native lib): reference semantics spec
        bases = np.array(list("ACGT"))
        strings = ["".join(row) for row in bases[codes.astype(np.int64)]]
        with gzip.open(path, "wt") as f:
            for s, c, l, r in zip(strings, counts, left, right):
                f.write(f"{s} {c} {l} {r}\n")


def contigging(fin, k: int, n_shards: int, options: Options):
    """UU-tig traversal over the finalized table (the dbjg_traversal stage the
    reference stubs out at src/contigging.cpp:107-117), emitting
    uutigs-<k>.fasta.

    Default engine for sharded tables (k<=32, n_shards>1) is the
    device-resident scalable traversal (contig/device.py): the global table is
    NEVER gathered onto a host — the reference's sharded-table traversal data
    model (src/kcount/kmer_dht.hpp:62-68)."""
    from ..contig import utg
    from ..table import shard_table_mw as stmw

    from ..parallel import distributed as dist

    use_device = (
        options.traversal == "device"
        or (options.traversal == "auto" and n_shards > 1)
    )
    if use_device:
        from ..contig.device import contigging_device
        from ..parallel import count_step as cs2

        stage_timers.dbjg_traversal.start()
        mesh = cs2.make_mesh(options.n_devices or None)
        utgs, n_all, len_all = contigging_device(
            fin, k, mesh, options.output_dir, f"uutigs-{k}.fasta",
            keep_contigs=options.ctg_kmers,
        )
        stage_timers.dbjg_traversal.stop()
        slog_verbose("Generated ", n_all, " uutigs, total length ", len_all)
        return utgs

    stage_timers.dbjg_traversal.start()
    if k > 32:
        all_s, all_c, all_l, all_r = [], [], [], []
        for _, one in local_fin_shards(fin, n_shards):
            s, c, l, r = stmw.compact_to_host_mw(one, k)
            all_s += s
            all_c += list(c)
            all_l += list(l)
            all_r += list(r)
        if jax.process_count() > 1:
            # gather the compacted host tables from every process (fixed-width
            # byte matrix for the kmer strings)
            smat = np.frombuffer(
                "".join(all_s).encode(), np.uint8
            ).reshape(-1, k) if all_s else np.zeros((0, k), np.uint8)
            smat = dist.gather_concat(smat)
            all_s = ["".join(map(chr, row)) for row in smat]
            all_c = list(dist.gather_concat(np.asarray(all_c, np.int64)))
            all_l = list(dist.gather_concat(np.asarray(all_l, np.int64)))
            all_r = list(dist.gather_concat(np.asarray(all_r, np.int64)))
        order = np.argsort(all_s)
        utgs = utg.build_utgs_mw(
            [all_s[i] for i in order],
            [all_c[i] for i in order],
            [all_l[i] for i in order],
            [all_r[i] for i in order],
            k,
        )
    else:
        all_vals, all_counts, all_left, all_right = [], [], [], []
        for _, one in local_fin_shards(fin, n_shards):
            keep = np.asarray(one.keep)
            hi = np.asarray(one.keys_hi)[keep].astype(np.uint64)
            lo = np.asarray(one.keys_lo)[keep].astype(np.uint64)
            all_vals.append((hi << np.uint64(32)) | lo)
            all_counts.append(np.asarray(one.counts)[keep])
            all_left.append(np.asarray(one.left_ext)[keep])
            all_right.append(np.asarray(one.right_ext)[keep])
        def cat(parts, dtype):
            arr = (np.concatenate(parts) if parts
                   else np.zeros((0,), dtype)).astype(dtype)
            return dist.gather_concat(arr)

        vals = cat(all_vals, np.uint64)
        order = np.argsort(vals)
        args_t = (
            vals[order],
            cat(all_counts, np.int64)[order],
            cat(all_left, np.int64)[order],
            cat(all_right, np.int64)[order],
            k,
        )
        if options.traversal == "sharded":
            from ..contig.distributed import build_utgs_sharded
            from ..parallel import count_step as cs2

            utgs = build_utgs_sharded(*args_t, mesh=cs2.make_mesh(options.n_devices or None))
        else:
            utgs = utg.build_utgs(*args_t)
    stage_timers.dbjg_traversal.stop()
    path = os.path.join(options.output_dir, f"uutigs-{k}.fasta")
    stage_timers.dump_ctgs.start()
    if jax.process_index() == 0:
        utg.dump_uutigs(utgs, k, path)
    dist.barrier("dump_ctgs")
    stage_timers.dump_ctgs.stop()
    slog_verbose("Generated ", len(utgs.seqs), " uutigs, total length ",
                 sum(len(s) for s in utgs.seqs))
    return utgs


def run_pipeline(options: Options) -> list:
    """Full run: load reads, one analysis round per k, write the CSV contract
    (proxy_results_summary.csv, src/main.cpp:340-392)."""
    t0 = time.time()
    from ..parallel import distributed as dist

    # multi-host wiring FIRST (before any backend/device access): one JAX
    # process per host, like one UPC++ rank team per node (src/main.cpp:129)
    rank, n_proc = dist.maybe_initialize()
    from ..utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    options.setup_output_dir()
    from ..utils.logging import init_logger
    from ..utils.memory import MemoryTracker, log_mem

    init_logger(options.output_dir, options.verbose)
    # affinity + worker-thread knobs before any heavy host work
    # (set_process_affinity / set_thread_pool, src/main.cpp:443-447); the
    # split uses HOST-LOCAL rank/count (local_team analogue) — processes on
    # different hosts each see their whole machine
    from ..utils.affinity import set_process_affinity

    local_rank, local_n = dist.host_local_rank()
    set_process_affinity(getattr(options, "pin_by", "none"), local_rank, local_n)
    if getattr(options, "max_worker_threads", 0):
        os.environ["OMP_NUM_THREADS"] = str(options.max_worker_threads)
    _update_rlimits(len(options.all_read_groups()))
    _log_env()
    if rank == 0:
        options.write_config_file()
    dist.barrier("startup")
    if n_proc > 1:
        slog("Multi-process run: ", n_proc, " processes, ",
             len(jax.devices()), " devices total")
    mem_tracker = MemoryTracker()
    mem_tracker.start()
    if options.checkpoint:
        # --checkpoint makes every round restartable: the merged-read cache
        # plus each round's on-disk artifacts (uutigs, dumps, the
        # "Completed contig round" log marker) let --restart resume mid-run
        # (the stage-skip protocol of src/mhm2.py:871-937)
        options.dump_merged = True
    completed_ks = _completed_rounds(options) if options.restart else set()
    _validate_inputs(options)
    pr = load_reads(options)
    log_mem("after loading reads")
    results = []
    prev_ctgs = None
    for k in options.kmer_lens:
        slog("_________________________")
        slog("Contig generation k = ", k)
        round_t0 = time.time()
        if k in completed_ks:
            uutigs_path = os.path.join(options.output_dir, f"uutigs-{k}.fasta")
            prev_res = _load_round_result(options.output_dir, k)
            if os.path.exists(uutigs_path) and prev_res is not None:
                slog("Restart: skipping completed contig round k = ", k)
                if options.ctg_kmers:
                    prev_ctgs = _load_uutigs_fasta(uutigs_path)
                # the skipped round still contributes its row to the CSV /
                # log contract, and the depth carryover must match the
                # original run (adjust_config_option, src/main.cpp:227-229)
                results.append(prev_res)
                options.sequencing_depth = max(int(prev_res.avg_kmer_count), 1)
                continue
            slog("Restart: round k = ", k, " marked complete but its "
                 "artifacts (uutigs/result sidecar) are missing; re-running it")
        res, fin, n_shards = analyze_kmers(pr, k, options, prev_ctgs=prev_ctgs)
        if options.dump_kmers:
            dump_kmers(fin, k, options.output_dir, n_shards)
        hist = count_histogram(fin, n_shards)
        if rank == 0:
            write_histogram(hist, k, options.output_dir)
        utgs = contigging(fin, k, n_shards, options)
        if options.ctg_kmers:
            # next round seeds from this round's contigs (add_ctg_kmers);
            # the Utgs object carries whether the set is process-local.
            # Depths carry at the uutigs-FASTA 3-decimal precision so a
            # restarted run (which reloads depths from the FASTA) is
            # bit-identical to an uninterrupted one.
            prev_ctgs = utg.Utgs(
                utgs.seqs, [float(f"{d:.3f}") for d in utgs.depths],
                utgs.local,
            )
        # sequencing depth update for next round (src/contigging.cpp:148-150),
        # written back to the config like adjust_config_option
        # (src/main.cpp:227-229)
        options.sequencing_depth = max(int(res.avg_kmer_count), 1)
        if rank == 0:
            options.write_config_file()
        res.elapsed_s = time.time() - round_t0
        res.peak_gb = max(mem_tracker.peak_gb, 0.0)
        results.append(res)
        if rank == 0:
            _save_round_result(options.output_dir, res)
        slog("Completed contig round k = ", k)
        log_mem(f"after contig round k={k}")
    elapsed = time.time() - t0
    peak_gb = mem_tracker.stop()
    if rank == 0:
        write_summary_csv(options, results, elapsed, peak_gb)
    slog(stage_timers.report(elapsed))
    if n_proc > 1:
        # the reference's min/my/avg/max balance reduction for stage timers
        # (src/main.cpp:439, upcxx_utils timer reductions)
        lines = ["    stage balance across processes (min/my/avg/max s):"]
        for s in stage_timers.STAGES:
            t = getattr(stage_timers, s)
            mn, my, avg, mx = dist.allstats(t.elapsed)
            if mx > 0:
                bal = avg / mx if mx else 1.0
                lines.append(
                    f"      {s:24s} {mn:8.2f} /{my:8.2f} /{avg:8.2f} /{mx:8.2f}"
                    f"  balance {bal:.3f}"
                )
        slog("\n".join(lines))
    from ..utils.comm_stats import comm_stats

    slog_verbose(comm_stats.report())
    if n_proc > 1:
        for metric, val in comm_stats.totals().items():
            mn, my, avg, mx = dist.allstats(val)
            slog_verbose(
                f"    comm balance {metric}: {mn:.0f} /{my:.0f} /{avg:.0f} /{mx:.0f}"
                f"  balance {avg / mx if mx else 1.0:.3f}"
            )
    # the reference's machine-readable log contract lines (src/main.cpp:351-356)
    tot_reads = sum(r.num_reads for r in results[:1])
    slog("tot_num_reads: ", tot_reads)
    if results:
        slog("Total kmers: ", results[-1].unique_kmers)
        slog("Total kmer count sum: ", results[-1].total_kmer_count_sum)
    _, _, _, peak_mx = dist.allstats(peak_gb)
    slog("Peak memory: ", f"{peak_mx:.2f} GB")
    dist.barrier("shutdown")
    return results


def _update_rlimits(num_input_files: int):
    """Raise the open-files soft limit for many per-rank logs/dumps
    (update_rlimits, src/main.cpp:113-125)."""
    if num_input_files <= 1:
        return
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        want = soft + num_input_files * 8
        if hard != resource.RLIM_INFINITY:
            want = min(want, hard)
        resource.setrlimit(resource.RLIMIT_NOFILE, (want, hard))
        slog_verbose("Set RLIMIT_NOFILE to ", want)
    except (ImportError, ValueError, OSError):
        slog_verbose("Could not get/set rlimits for NOFILE")


def _log_env():
    """Log relevant environment at startup (log_env, src/utils.cpp:433)."""
    keys = [k for k in sorted(os.environ)
            if k.startswith(("JAX_", "XLA_", "MHM2_", "OMP_", "SLURM_", "TPU_"))]
    if keys:
        slog_verbose("Environment:")
        for k in keys:
            slog_verbose("  ", k, "=", os.environ[k])


def _validate_inputs(options: Options):
    """Fail-fast input validation + sizing estimate before ingest: per-file
    check_is_fastq (src/fastq.cpp:173-282), sampled read-count estimate
    (src/merge_reads.cpp:84-192), and the 3x-input free-memory sanity check
    (src/main.cpp:153-156)."""
    from ..io.fastq import check_is_fastq, estimate_num_reads, is_gz
    from ..utils.memory import check_input_size

    total_bytes = 0
    est_reads = 0
    for group in options.all_read_groups():
        for f in group:
            check_is_fastq(f)
            sz = os.path.getsize(f)
            total_bytes += sz * 3 if is_gz(f) else sz
            est_reads += estimate_num_reads(f)
    slog_verbose("Estimated total reads across inputs: ", est_reads)
    warning = check_input_size(total_bytes)
    if warning:
        slog("WARNING: ", warning)


def _completed_rounds(options: Options) -> set:
    """k values whose rounds completed in a previous run of this output dir,
    read from the log's 'Completed contig round k = ' markers (the marker
    mhm2.py's auto-restart watches for, src/mhm2.py:871-937)."""
    ks: set = set()
    path = os.path.join(options.output_dir, "mhm2.log")
    if not os.path.exists(path):
        return ks
    marker = "Completed contig round k = "
    with open(path) as f:
        for line in f:
            if marker in line:
                try:
                    ks.add(int(line.split(marker, 1)[1].split()[0]))
                except (ValueError, IndexError):
                    pass
    return ks


def _round_result_path(output_dir: str, k: int) -> str:
    return os.path.join(output_dir, f"round-{k}-result.json")


def _save_round_result(output_dir: str, res: AnalysisResult):
    """Per-round result sidecar: lets --restart reconstruct the skipped
    round's CSV row and depth carryover instead of silently omitting them."""
    import dataclasses
    import json

    with open(_round_result_path(output_dir, res.k), "w") as f:
        json.dump(dataclasses.asdict(res), f)


def _load_round_result(output_dir: str, k: int):
    import json

    path = _round_result_path(output_dir, k)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return AnalysisResult(**json.load(f))
    except (ValueError, TypeError):
        return None


def _load_uutigs_fasta(path: str) -> list:
    """(seq, depth) pairs from a uutigs-<k>.fasta written by dump_uutigs —
    restores the --ctg-kmers carryover input on restart."""
    out = []
    depth = 1.0
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith(">"):
            parts = line.split()
            depth = float(parts[1]) if len(parts) > 1 else 1.0
        elif line:
            out.append((line, depth))
    return out


def write_summary_csv(options: Options, results: list, elapsed: float, peak_gb: float = 0.0):
    """proxy_results_summary.csv with the reference's schema
    (Reads, Unique kmers, Total kmers, Fraction, Peak mem GB, seconds —
    src/main.cpp:382-391)."""
    path = os.path.join(options.output_dir, "proxy_results_summary.csv")
    with open(path, "w") as f:
        f.write("Reads,Unique kmers,Total kmers,Fraction unique,Peak memory (GB),Timing (s)\n")
        for r in results:
            frac = r.unique_kmers / r.total_kmer_count_sum if r.total_kmer_count_sum else 0
            # per-round timing/peak when recorded (restart sidecars from
            # older runs may lack them -> fall back to the whole-run values)
            row_t = r.elapsed_s if r.elapsed_s > 0 else elapsed
            row_gb = r.peak_gb if r.peak_gb > 0 else peak_gb
            f.write(
                f"{r.num_reads},{r.unique_kmers},{r.total_kmer_count_sum},"
                f"{frac:.4f},{row_gb:.2f},{row_t:.2f}\n"
            )
