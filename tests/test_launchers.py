"""Launcher scripts: run_app log scrape and mhm2_tpu auto-resume."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    PYTHONPATH=REPO,
    JAX_PLATFORMS="cpu",
    PALLAS_AXON_POOL_IPS="",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)


def _write_reads(path, n=40):
    rng = np.random.default_rng(1)
    genome = "".join(rng.choice(list("ACGT"), 400))
    with open(path, "w") as f:
        for i in range(n):
            p = int(rng.integers(0, 400 - 60))
            f.write(f"@r{i}\n{genome[p:p+60]}\n+\n{'K' * 60}\n")


def test_run_app_scrapes_kmers(tmp_path):
    fq = tmp_path / "r.fastq"
    _write_reads(fq)
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_app.py"),
         "-r", str(fq), "-o", str(out)],
        capture_output=True, text=True, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "Total kmers:" in r.stdout
    assert "Elapsed:" in r.stdout


def test_mhm2_tpu_launcher_success(tmp_path):
    fq = tmp_path / "r.fastq"
    _write_reads(fq)
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "mhm2_tpu.py"),
         "-o", str(out), "-r", str(fq), "-k", "21"],
        capture_output=True, text=True, env=ENV, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert (out / "proxy_results_summary.csv").exists()


def test_mhm2_tpu_launcher_failure_reports(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "mhm2_tpu.py"),
         "-o", str(tmp_path / "o"), "-r", "nonexistent.fastq"],
        capture_output=True, text=True, env=ENV, timeout=500,
    )
    assert r.returncode != 0
    assert "run failed" in r.stderr
