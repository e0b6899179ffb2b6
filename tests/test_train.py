"""Training subsystem: loss sanity, dp/tp-sharded train step on the forced
8-device CPU mesh, and equality of sharded vs single-device steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evossearch_tpu.core.constants import CLIPModelSpec
from evossearch_tpu.models import init_params
from evossearch_tpu.train import (
    batch_shardings,
    clip_loss,
    clip_param_shardings,
    make_optimizer,
    make_train_step,
    train_mesh,
)

TINY = CLIPModelSpec(
    name="tiny", image_size=32, patch_size=16, vision_width=64,
    vision_layers=2, vision_heads=4, text_width=64, text_layers=2,
    text_heads=4, vocab_size=256, context_length=16, embed_dim=32,
)


def _batch(n=8):
    rng = np.random.default_rng(0)
    images = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((n, 16), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1:8] = rng.integers(2, 254, (n, 7))
    tokens[:, 8] = 255  # eot = max id
    return jnp.asarray(images), jnp.asarray(tokens)


def test_loss_finite_and_decreases():
    params = init_params(jax.random.key(0), TINY)
    images, tokens = _batch()
    opt = make_optimizer(learning_rate=1e-3)
    step = jax.jit(make_train_step(TINY, opt))
    opt_state = opt.init(params)
    loss0 = float(clip_loss(params, images, tokens, TINY))
    assert np.isfinite(loss0)
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, images, tokens)
    assert float(loss) < loss0  # overfits one batch fast


def test_sharded_train_step_matches_unsharded():
    mesh = train_mesh(model_parallel=2)  # 4x2 (data, model) over 8 cpus
    params = init_params(jax.random.key(1), TINY)
    images, tokens = _batch(8)
    opt = make_optimizer(learning_rate=1e-3)
    step = make_train_step(TINY, opt)

    # unsharded oracle
    p1, _, loss1 = jax.jit(step)(params, opt.init(params), images, tokens)

    # sharded: params per tp rules, batch over data axis
    p_shard = clip_param_shardings(mesh)
    img_s, tok_s = batch_shardings(mesh)
    params_sh = jax.device_put(params, p_shard)
    opt_state_sh = opt.init(params_sh)
    step_sh = jax.jit(step)
    p2, _, loss2 = step_sh(
        params_sh, opt_state_sh,
        jax.device_put(images, img_s), jax.device_put(tokens, tok_s),
    )
    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_param_shardings_cover_every_leaf():
    params = init_params(jax.random.key(0), TINY)
    mesh = train_mesh(model_parallel=2)
    shardings = clip_param_shardings(mesh)
    # identical treedefs => every param leaf has a sharding
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda s: 0, shardings,
                               is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert t1 == t2
