"""Test configuration: force an 8-virtual-device CPU mesh.

Tests never touch the real TPU; multi-chip sharding paths are exercised on
XLA's forced host-platform device count (the standard JAX substitute for a
fake distributed backend — SURVEY.md §4.3). Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(0)
