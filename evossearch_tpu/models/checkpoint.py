"""Save/load of our own param pytrees (.npz).

The reference's only weights artifact is the downloaded OpenAI .pt
(oldapp.py:28); here fine-tuned or converted weights persist in a simple
flat-key npz with a JSON-encoded spec, so a server can boot from either an
OpenAI/HF checkpoint (models/convert.py) or a native one.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

from ..core.constants import CLIPModelSpec, CLIPResNetSpec


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    for key, value in tree.items():
        name = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(_flatten(value, name))
        else:
            flat[name] = np.asarray(value)
    return flat


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for name, value in flat.items():
        parts = name.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str | Path, params: dict, spec: CLIPModelSpec) -> Path:
    """Write a native checkpoint; returns the ACTUAL path written.

    np.savez silently appends ``.npz`` to suffix-less paths, which would
    desynchronize the saved file from what callers report/load — so the
    path is normalized here and returned."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    spec_dict = dict(dataclasses.asdict(spec), family=spec.family)
    flat["__spec__"] = np.frombuffer(
        json.dumps(spec_dict).encode(), dtype=np.uint8
    )
    np.savez(path, **flat)
    return path


def load_params(path: str | Path) -> tuple[dict, CLIPModelSpec]:
    with np.load(Path(path), allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    spec_raw = bytes(flat.pop("__spec__")).decode()
    spec_dict = json.loads(spec_raw)
    # pre-round-4 checkpoints carry no family key: they are all ViT
    family = spec_dict.pop("family", "vit")
    cls = CLIPResNetSpec if family == "resnet" else CLIPModelSpec
    spec = cls(**spec_dict)
    return _unflatten(flat), spec


# -- orbax-backed sharded checkpoints (multi-host / sharded training) --
#
# The npz format above gathers everything to one host — fine for CLIP-sized
# models. For sharded training state (params + optimizer moments across a
# mesh), orbax writes each shard from its owner and restores with the
# target shardings, no host gather.


def save_sharded(path: str | Path, state) -> None:
    """Save a (possibly sharded) pytree with orbax; blocks until durable."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()


def load_sharded(path: str | Path, target):
    """Restore into ``target``'s structure/shardings (abstract arrays ok)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), target)
