"""Test env: CPU backend with 8 virtual devices for multi-chip sharding tests.

This container's sitecustomize imports jax at interpreter boot (to register
the remote-TPU plugin), which freezes JAX_PLATFORMS=axon into jax.config
before conftest can touch os.environ.  So the platform must be forced through
jax.config.update; XLA_FLAGS still works via the environment because the CPU
backend client is created lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    n = jax.device_count()
    assert n >= 8, (
        f"tests need 8 virtual CPU devices, got {n} on {jax.default_backend()!r};"
        " the platform/device-count forcing in conftest.py failed"
    )


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between modules: a full 196-test run keeps
    every jitted program's LLVM JIT code alive in-process and XLA:CPU
    eventually segfaults inside backend_compile_and_load (deterministically at
    ~190 in-process compiles; the same test passes standalone and in any
    subset).  Clearing per module bounds the resident executable count; the
    recompiles it causes are cheap relative to the suite."""
    yield
    jax.clear_caches()
