"""True multi-process execution: 2 jax.distributed processes x 4 CPU devices.

The round-trip the reference makes across UPC++ ranks (per-rank FASTQ blocks
-> owner exchange -> reduced reports, src/fastq.cpp:810-892, main.cpp:273-287)
must be invisible in the output: a 2-process run over the same 8-way mesh
produces byte-identical per-shard dumps to the 1-process run.
"""

import glob
import gzip
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_fastq(path, n_pairs=150, read_len=80, genome_len=1500, seed=7):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), genome_len))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    with open(path, "w") as f:
        for i in range(n_pairs):
            pos = int(rng.integers(0, genome_len - 2 * read_len))
            s1 = genome[pos : pos + read_len]
            frag_end = pos + int(rng.integers(int(1.5 * read_len), 2 * read_len))
            s2fwd = genome[frag_end - read_len : frag_end]
            s2 = "".join(comp[c] for c in reversed(s2fwd))
            q1 = "".join(chr(int(q)) for q in rng.integers(35, 73, read_len))
            q2 = "".join(chr(int(q)) for q in rng.integers(35, 73, read_len))
            f.write(f"@pair{i}/1\n{s1}\n+\n{q1}\n@pair{i}/2\n{s2}\n+\n{q2}\n")
    return genome


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pipeline(outdir, fastq, n_devices, extra_env, extra_args=(), k=21):
    env = dict(os.environ)
    env.pop("PYTHONSTARTUP", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO
    env.update(extra_env)
    cmd = [
        sys.executable, "-m", "mhm2_kmer_analysis_v2_tpu.pipeline.main",
        "-r", fastq, "-k", str(k), "-o", outdir, "--dump-kmers",
    ] + list(extra_args)
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_world(outdir, fastq, n_procs, devs_per_proc, extra_args=(), k=21):
    """Launch an n-process jax.distributed pipeline run; returns logs."""
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        procs.append(_run_pipeline(
            outdir, fastq, devs_per_proc,
            {
                "COORDINATOR_ADDRESS": f"localhost:{port}",
                "NUM_PROCESSES": str(n_procs),
                "PROCESS_ID": str(pid),
            },
            extra_args=extra_args, k=k,
        ))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]
    return logs


def _read_dumps(outdir, k=21):
    out = {}
    for fn in sorted(glob.glob(os.path.join(outdir, "per_rank", f"kmers-{k}.txt.gz.*"))):
        shard = int(fn.rsplit(".", 1)[1])
        out[shard] = gzip.open(fn, "rb").read()
    return out


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    fastq = str(tmp_path / "mp.fastq")
    _gen_fastq(fastq)

    # 1-process / 8-device baseline
    out_sp = str(tmp_path / "out_sp")
    p = _run_pipeline(out_sp, fastq, 8, {})
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    # 2 processes x 4 devices over jax.distributed
    out_mp = str(tmp_path / "out_mp")
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(_run_pipeline(
            out_mp, fastq, 4,
            {
                "COORDINATOR_ADDRESS": f"localhost:{port}",
                "NUM_PROCESSES": "2",
                "PROCESS_ID": str(pid),
            },
        ))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    # per-shard dumps byte-identical (shard placement is mesh-order stable)
    dumps_sp = _read_dumps(out_sp)
    dumps_mp = _read_dumps(out_mp)
    assert set(dumps_sp) == set(dumps_mp) == set(range(8))
    assert dumps_sp == dumps_mp

    # summary CSV scalars identical (reads reduced across processes)
    csv_sp = open(os.path.join(out_sp, "proxy_results_summary.csv")).readlines()[1]
    csv_mp = open(os.path.join(out_mp, "proxy_results_summary.csv")).readlines()[1]
    assert csv_sp.split(",")[:4] == csv_mp.split(",")[:4]

    # contigs identical
    utg_sp = open(os.path.join(out_sp, "uutigs-21.fasta")).read()
    utg_mp = open(os.path.join(out_mp, "uutigs-21.fasta")).read()
    assert utg_sp == utg_mp

    # rank-0 log carries the multi-process markers + balance reduction
    log0 = logs[0] + logs[1]
    assert "Multi-process run: 2 processes" in log0
    assert "balance across processes" in log0


@pytest.mark.slow
def test_four_process_run_matches_single_process(tmp_path):
    """4 processes x 2 devices == 1 process x 8 devices, byte-identical
    dumps (VERDICT r4 item 7: widen beyond the 2-process drill)."""
    fastq = str(tmp_path / "mp4.fastq")
    _gen_fastq(fastq)

    out_sp = str(tmp_path / "out_sp")
    p = _run_pipeline(out_sp, fastq, 8, {})
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    out_mp = str(tmp_path / "out_mp")
    logs = _run_world(out_mp, fastq, 4, 2)

    dumps_sp = _read_dumps(out_sp)
    dumps_mp = _read_dumps(out_mp)
    assert set(dumps_sp) == set(dumps_mp) == set(range(8))
    assert dumps_sp == dumps_mp
    assert "Multi-process run: 4 processes" in "".join(logs)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["qf", "mw"])
def test_two_process_dump_parity_qf_and_mw(tmp_path, mode):
    """2-process dump parity for the --use-qf and multi-word table families
    (VERDICT r4 item 7; the r4 drill only covered the plain k=21 table)."""
    fastq = str(tmp_path / "mpq.fastq")
    _gen_fastq(fastq)
    k = 21 if mode == "qf" else 33
    extra = ("--use-qf",) if mode == "qf" else ()

    out_sp = str(tmp_path / "out_sp")
    p = _run_pipeline(out_sp, fastq, 8, {}, extra_args=extra, k=k)
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    out_mp = str(tmp_path / "out_mp")
    _run_world(out_mp, fastq, 2, 4, extra_args=extra, k=k)

    dumps_sp = _read_dumps(out_sp, k=k)
    dumps_mp = _read_dumps(out_mp, k=k)
    assert set(dumps_sp) == set(dumps_mp) == set(range(8))
    assert dumps_sp == dumps_mp


@pytest.mark.slow
def test_restart_under_different_world_size(tmp_path):
    """--restart with a different process count than the checkpointing run:
    the merged-read blocks are world-size-stamped, so the restart must
    RE-INGEST its own byte ranges (never load misaligned blocks) and still
    produce identical dumps (restart reproducibility contract,
    src/options.cpp:504-514; io/ingest.py world-size stamp)."""
    fastq = str(tmp_path / "mpr.fastq")
    _gen_fastq(fastq)

    # baseline single-process run for the expected dumps
    out_ref = str(tmp_path / "out_ref")
    p = _run_pipeline(out_ref, fastq, 8, {})
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]

    # checkpointing 2-process run
    out = str(tmp_path / "out")
    _run_world(out, fastq, 2, 4, extra_args=("--checkpoint",))
    assert glob.glob(os.path.join(out, "*-merged.fastq.gz.0of2")), \
        "2-process run must leave world-size-stamped merged blocks"

    # invalidate the completed round so the restart recounts, then restart
    # SINGLE-process (world size 1 != 2)
    os.remove(os.path.join(out, "uutigs-21.fasta"))
    p = _run_pipeline(out, fastq, 8, {}, extra_args=("--restart",))
    log = p.communicate(timeout=900)[0]
    assert p.returncode == 0, log[-4000:]
    # the stamped blocks must NOT have been loaded (names don't match world
    # size 1) — the restart re-ingests instead
    assert "loading merged reads" not in log

    dumps_ref = _read_dumps(out_ref)
    dumps_rs = _read_dumps(out)
    assert set(dumps_ref) == set(dumps_rs) == set(range(8))
    assert dumps_ref == dumps_rs


def test_maybe_initialize_scheduler_autodetect(monkeypatch):
    """SLURM-style env triggers the no-arg jax.distributed.initialize
    (scheduler detection, the src/mhm2.py:110-341 analogue)."""
    import jax

    from mhm2_kmer_analysis_v2_tpu.parallel import distributed as dist

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **kw: calls.append((a, kw)))
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    # inside an srun step: per-task variables present -> auto-init
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "0")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node[0-1]")
    dist.maybe_initialize()
    assert calls == [((), {})]

    # salloc shell (allocation without srun): NTASKS set but no per-task
    # variables -> must NOT attempt init (it would fail or block on peers)
    calls.clear()
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    monkeypatch.delenv("SLURM_STEP_NODELIST", raising=False)
    dist.maybe_initialize()
    assert calls == []

    # single-task SLURM job: no init attempt
    calls.clear()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    monkeypatch.setenv("SLURM_PROCID", "0")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node0")
    dist.maybe_initialize()
    assert calls == []

    # empty NTASKS must not crash
    calls.clear()
    monkeypatch.setenv("SLURM_NTASKS", "")
    dist.maybe_initialize()
    assert calls == []

    # TPU pod slice: megascale coordinator env (set by the TPU runtime on
    # every pod worker) -> no-arg auto-init, no SLURM vars needed
    calls.clear()
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    monkeypatch.setenv("MEGASCALE_COORDINATOR_ADDRESS", "tpu-pod-coord:8080")
    dist.maybe_initialize()
    assert calls == [((), {})]
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)


@pytest.mark.slow
@pytest.mark.parametrize("k", [21, 33, 160])
def test_two_process_point_queries(tmp_path, k):
    """Collective point queries (VERDICT r2 item 9, r3 item 4): each process
    queries its OWN k-mer list against the live sharded table across 2
    processes — the any-rank get_kmer_count RPC for every templated k
    (src/kcount/kmer_dht.cpp:216-245; MAX_K=160 CMakeLists.txt:259-271).
    k=21 rides the u32-pair wire; 33/160 ride W-word multiword planes."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONSTARTUP", None)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["PYTHONPATH"] = REPO + os.pathsep + os.path.join(REPO, "tests")
        env.update({
            "COORDINATOR_ADDRESS": f"localhost:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_query_driver.py"),
             str(k)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, (pid, log[-4000:])
        assert f"MP_QUERY_OK rank={pid}" in log, (pid, log[-2000:])
