"""Persistent XLA compilation cache.

Compiles for the tunneled/remote TPU take tens of seconds to minutes per
program; the reference amortizes nothing comparable (its CUDA kernels are
AOT), but a JAX framework pays the JIT cost once per process. Enabling
jax's persistent compilation cache makes every process after the first
reuse the serialized executables (measured on the axon chip: bench.py
cold wall 58s -> 9.4s in a fresh process).

Opt out with MHM2_TPU_COMP_CACHE="" (or point it somewhere else).
"""

from __future__ import annotations

import hashlib
import os

_done = False


def _cpu_feature_tag() -> str:
    """Hash of this host's CPU feature flags.  XLA:CPU serializes AOT
    executables specialized to the compile host's ISA extensions; loading one
    on a host with different features is explicitly unsupported (the loader
    warns "could lead to execution errors such as SIGILL") and was observed to
    wedge an 8-device collective mid-run when the cache had been populated on
    a different machine.  Keying the CPU cache by feature set makes entries
    host-portable-safe; TPU executables target the chip, not the host, so the
    TPU cache stays shared."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "noflags"


def enable_compilation_cache() -> str | None:
    """Idempotently enable the on-disk compile cache; returns the dir used."""
    global _done
    cache_dir = os.environ.get(
        "MHM2_TPU_COMP_CACHE",
        os.path.expanduser("~/.cache/mhm2_tpu/xla_cache"),
    )
    if not cache_dir or _done:
        return cache_dir or None
    try:
        import jax

        if jax.default_backend() == "cpu":
            cache_dir = os.path.join(cache_dir, "cpu-" + _cpu_feature_tag())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        _done = True
        return cache_dir
    except Exception:
        return None
