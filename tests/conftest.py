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
