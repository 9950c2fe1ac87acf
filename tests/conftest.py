"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU with
``--xla_force_host_platform_device_count=8`` (the reference has no distributed
runtime at all — SURVEY.md §2.7 — so all mesh tests here are new surface).

NOTE: this environment presets ``JAX_PLATFORMS=axon`` (a tunneled TPU) and the
env var cannot be overridden by re-exporting; only
``jax.config.update("jax_platforms", ...)`` before backend init wins. Tests
must run on CPU so they are hermetic and can emulate an 8-device mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Deterministic fp32 matmuls for numerics tests.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
