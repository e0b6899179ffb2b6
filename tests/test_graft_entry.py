"""Driver entry-point checks.

Round-1 regression: the driver's ``dryrun_multichip(8)`` failed because it
assumed the caller had already provisioned a virtual mesh; under the driver's
default environment ``jax.devices()`` is the single real TPU. It must now
self-provision (VERDICT.md round 1, item 1).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 512)


def test_dryrun_inprocess_on_provisioned_mesh():
    # conftest provisions 8 CPU devices; the ready-check must detect it and
    # run in-process (no child spawn).
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    assert g._cpu_mesh_ready(8)
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_selfprovisions_from_bare_env():
    # Simulate the driver's default environment: no JAX_PLATFORMS, no forced
    # host device count. dryrun_multichip must succeed anyway by re-execing
    # a provisioned child.
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_EVOSSEARCH_DRYRUN_CHILD")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh=(data=4, model=2)" in proc.stdout
