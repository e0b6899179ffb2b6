"""Test configuration: force an 8-virtual-device CPU mesh.

Tests never touch the real TPU; multi-chip sharding paths are exercised on
XLA's forced host-platform device count (the standard JAX substitute for a
fake distributed backend — SURVEY.md §4.3). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# transformers (torch parity oracle) must not drag in TF/flax backends.
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_TORCH", "1")
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize registers the TPU plugin and force-sets
# jax_platforms="axon,cpu" at interpreter startup, overriding the env var —
# override it back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(0)
