"""Options / CLI — the Options class equivalent (src/options.{hpp,cpp}).

Same surface: -r interleaved/unpaired read files, -p paired (encoded f1:f2),
-u unpaired (f:), -k kmer length(s), -o output dir, quality offset, dump
flags, store sizing knobs, subsampling, restart config files.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from dataclasses import dataclass, field, asdict


@dataclass
class Options:
    # file groups use the reference's ':' encodings (src/options.cpp:379-405):
    # paired files are "f1:f2", unpaired are "f:"; interleaved are bare names
    reads_fnames: list = field(default_factory=list)
    paired_fnames: list = field(default_factory=list)
    unpaired_fnames: list = field(default_factory=list)
    adapter_trim: bool = True
    adapter_fname: str = ""
    kmer_lens: list = field(default_factory=lambda: [21])  # src/options.hpp:80
    qual_offset: int = 33
    verbose: bool = False
    max_kmer_store_mb: int = 0  # 0 = 1% of memory (src/options.hpp:86)
    max_rpcs_in_flight: int = 100
    dmin_thres: int = 2
    subsample_fastq_pct: int = 100
    checkpoint: bool = False
    dump_merged: bool = False
    show_progress: bool = False
    output_dir: str = ""
    dump_kmers: bool = False
    use_qf: bool = False
    sequencing_depth: int = 4  # src/options.hpp:103
    optimize_for: str = "default"
    # --pin: cpu | core | numa | rr_numa | none; default numa like
    # src/options.hpp:94, MHM2_PIN env overrides (src/options.cpp:332)
    pin_by: str = "numa"
    # OpenMP threads for the native merge kernel (--max-worker-threads,
    # src/options.cpp:329-331); 0 = library default
    max_worker_threads: int = 0
    restart: bool = False
    # contig-kmer carryover between k rounds (the add_ctg_kmers stage the
    # reference proxy keeps commented out; off by default for proxy parity)
    ctg_kmers: bool = False
    # TPU-native knobs (no reference analogue)
    batch_reads: int = 8192
    n_devices: int = 0  # 0 = all
    # UU-tig traversal engine: 'auto' = device-resident scalable traversal
    # (contig/device.py) whenever the table is sharded (k<=32, n_shards>1) —
    # never materializes the global table on a host; 'device' forces it;
    # 'host' forces the gather-to-host pointer-doubling builder; 'sharded'
    # keeps the round-2 host-gather + collective-doubling builder
    traversal: str = "auto"
    wire: str = "auto"
    # jax.profiler trace dir for the count stage (SURVEY §5.1 tracing; empty
    # = off) — the xprof/GASNet-trace analogue
    xprof_dir: str = ""

    def all_read_groups(self) -> list:
        """Expand to a list of file-name lists: [f] interleaved, [f1,f2] pair."""
        groups = [[f] for f in self.reads_fnames]
        groups += [f.split(":")[:2] for f in self.paired_fnames]
        groups += [[f.rstrip(":")] for f in self.unpaired_fnames]
        return groups

    def setup_output_dir(self):
        """mkdir + chdir convention of src/options.cpp:86-199 (no Lustre
        striping on TPU VMs)."""
        if not self.output_dir:
            self.output_dir = "mhm2-run-" + time.strftime("%Y%m%d%H%M%S")
        os.makedirs(os.path.join(self.output_dir, "per_rank"), exist_ok=True)

    def write_config_file(self):
        """Persist the run config for restart (src/options.cpp:504-514)."""
        path = os.path.join(self.output_dir, "per_rank", "mhm2.config")
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2)
        link = os.path.join(self.output_dir, "mhm2.config")
        if not os.path.exists(link):
            try:
                os.link(path, link)
            except OSError:
                pass


def parse_args(argv=None) -> Options:
    p = argparse.ArgumentParser(
        prog="mhm2-tpu",
        description="TPU-native MHM2 k-mer analysis (JAX/XLA/Pallas)",
    )
    p.add_argument("-r", "--reads", nargs="+", default=[], help="interleaved or unpaired FASTQ")
    p.add_argument("-p", "--paired-reads", nargs="+", default=[], help="paired FASTQ: f1 f2 [f1 f2 ...]")
    p.add_argument("-u", "--unpaired-reads", nargs="+", default=[])
    p.add_argument("-k", "--kmer-lens", nargs="+", type=int, default=[21])
    p.add_argument("-o", "--output", default="")
    p.add_argument("-Q", "--quality-offset", type=int, default=33)
    p.add_argument("--min-depth-thres", type=int, default=2)
    p.add_argument("--max-kmer-store", type=int, default=0, help="MB per rank")
    p.add_argument("--max-rpcs-in-flight", type=int, default=100)
    p.add_argument("--subsample-pct", type=int, default=100)
    p.add_argument("--sequencing-depth", type=int, default=4)
    p.add_argument("--optimize", choices=["default", "contiguity", "correctness"],
                   default="default",
                   help="contiguity uses blastn-scored adapter alignment "
                        "(src/options.cpp:316-320)")
    # env default like src/options.cpp:332
    p.add_argument("--pin", choices=["cpu", "core", "numa", "rr_numa", "none"],
                   default=os.environ.get("MHM2_PIN", "numa"),
                   help="restrict the process to logical CPUs, cores, or NUMA "
                        "domains (src/main.cpp:92-104)")
    p.add_argument("--max-worker-threads", type=int, default=0,
                   help="OpenMP threads for the native merge kernel "
                        "(0 = library default)")
    p.add_argument("--dump-kmers", action="store_true")
    p.add_argument("--dump-merged", action="store_true")
    p.add_argument("--checkpoint", action="store_true")
    p.add_argument("--use-qf", action="store_true")
    p.add_argument("--ctg-kmers", action="store_true",
                   help="seed each k round with the previous round's contig kmers")
    p.add_argument("--adapter-refs", default="")
    p.add_argument("--no-adapter-trim", action="store_true")
    p.add_argument("--progress", action="store_true")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--restart", action="store_true",
                   help="resume in an existing output dir from its config + checkpoints")
    p.add_argument("--batch-reads", type=int, default=8192)
    p.add_argument("--n-devices", type=int, default=0)
    p.add_argument("--distributed-traversal", action="store_true",
                   help="legacy alias for --traversal sharded")
    p.add_argument("--traversal", choices=["auto", "device", "host", "sharded"],
                   default="auto",
                   help="UU-tig traversal engine (auto = device-resident "
                   "scalable traversal when the table is sharded)")
    p.add_argument("--wire", choices=["auto", "supermer", "record"], default="auto",
                   help="owner-exchange wire format: supermer compresses bytes "
                        "2-3x (best across hosts/DCN); record skips the "
                        "receiver-side window re-extraction (best when compute"
                        "-bound); auto = supermer for multi-process runs")
    p.add_argument("--xprof", default="",
                   help="write a jax.profiler trace of the count stage to this dir")
    p.add_argument("--config", default="", help="load options from a config file")
    a = p.parse_args(argv)

    # argparse validates `choices` only for values typed on the command
    # line; an MHM2_PIN env default bypasses it
    if a.pin not in ("cpu", "core", "numa", "rr_numa", "none"):
        p.error(f"invalid --pin / MHM2_PIN value {a.pin!r} "
                "(choose from cpu, core, numa, rr_numa, none)")

    if a.restart and a.output and not a.config:
        cfg = os.path.join(a.output, "mhm2.config")
        if os.path.exists(cfg):
            a.config = cfg

    if a.config:
        with open(a.config) as f:
            data = json.load(f)
        data["restart"] = a.restart or data.get("restart", False)
        known = {f.name for f in Options.__dataclass_fields__.values()}
        return Options(**{kk: v for kk, v in data.items() if kk in known})

    if len(a.paired_reads) % 2:
        p.error("-p requires pairs of files")
    paired = [
        f"{a.paired_reads[i]}:{a.paired_reads[i+1]}"
        for i in range(0, len(a.paired_reads), 2)
    ]
    return Options(
        reads_fnames=a.reads,
        paired_fnames=paired,
        unpaired_fnames=[f + ":" for f in a.unpaired_reads],
        adapter_trim=not a.no_adapter_trim,
        adapter_fname=a.adapter_refs,
        kmer_lens=a.kmer_lens,
        qual_offset=a.quality_offset,
        verbose=a.verbose,
        max_kmer_store_mb=a.max_kmer_store,
        max_rpcs_in_flight=a.max_rpcs_in_flight,
        dmin_thres=a.min_depth_thres,
        subsample_fastq_pct=a.subsample_pct,
        checkpoint=a.checkpoint,
        dump_merged=a.dump_merged,
        show_progress=a.progress,
        output_dir=a.output,
        dump_kmers=a.dump_kmers,
        use_qf=a.use_qf,
        ctg_kmers=a.ctg_kmers,
        traversal=("sharded" if a.distributed_traversal else a.traversal),
        wire=a.wire,
        xprof_dir=a.xprof,
        sequencing_depth=a.sequencing_depth,
        optimize_for=a.optimize,
        pin_by=a.pin,
        max_worker_threads=a.max_worker_threads,
        batch_reads=a.batch_reads,
        n_devices=a.n_devices,
    )
