"""Orbax sharded checkpointing of training state on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from evossearch_tpu.core.constants import CLIPModelSpec
from evossearch_tpu.models import init_params
from evossearch_tpu.models.checkpoint import load_sharded, save_sharded
from evossearch_tpu.train import clip_param_shardings, train_mesh

TINY = CLIPModelSpec(
    name="tiny", image_size=32, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, text_width=64, text_layers=2,
    text_heads=4, vocab_size=256, context_length=16, embed_dim=32,
)


def test_sharded_save_restore_roundtrip(tmp_path):
    mesh = train_mesh(model_parallel=2)
    shardings = clip_param_shardings(mesh)
    params = jax.device_put(init_params(jax.random.key(0), TINY), shardings)
    save_sharded(tmp_path / "ckpt", params)

    # restore into abstract targets carrying the shardings
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        params,
    )
    restored = load_sharded(tmp_path / "ckpt", target)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
