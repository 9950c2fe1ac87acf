"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on CPU with
``--xla_force_host_platform_device_count=8`` (the reference has no distributed
runtime at all — SURVEY.md §2.7 — so all mesh tests here are new surface).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    import jax

    return jax.random.PRNGKey(0)
