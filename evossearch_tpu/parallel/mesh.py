"""Device mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2 "Parallelism":
single process, one device, oldapp.py:23). Scale here comes from
jax.sharding: a 1-D mesh whose axis shards the embedding corpus by rows
("corpus sharding", the search analog of model parallelism), with XLA
collectives over ICI doing the top-k merge.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

CORPUS_AXIS = "shard"


def corpus_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """1-D mesh over ``n_devices`` (0 = all available)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (CORPUS_AXIS,))
