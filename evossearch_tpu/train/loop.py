"""Training loop: contrastive fine-tuning with checkpointing and retrieval
eval. Composes train/contrastive.py's sharded step with train/data.py's
loader and models/checkpoint.py persistence.

Usage:
    result = fit(spec, dataset, epochs=3, checkpoint_dir="ckpts",
                 mesh=train_mesh(model_parallel=2))
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import CLIPModelSpec
from ..models import encode_image, encode_text, init_params
from ..models.checkpoint import load_params, save_params
from ..preprocess import device_preprocess_indexed
from ..utils import get_logger
from .contrastive import (
    batch_shardings,
    clip_param_shardings,
    make_optimizer,
    make_train_step,
)

log = get_logger("train")


import functools


@functools.lru_cache(maxsize=8)
def _retrieval_fwd(spec: CLIPModelSpec, compute_dtype):
    """Jitted eval forward, cached per (spec, dtype) at module level —
    a closure-local jit would recompile the full towers on every
    retrieval_accuracy call (the jit cache dies with the closure); eager
    dispatch would pay this rig's per-dispatch RPC floor hundreds of
    times per batch."""

    @jax.jit
    def fwd(params, canv, a_h, a_w, idx, tokens):
        images = device_preprocess_indexed(
            canv, a_h, a_w, idx, out_dtype=compute_dtype
        )
        img_emb = encode_image(params, images, spec, compute_dtype=compute_dtype)
        txt_emb = encode_text(params, tokens, spec, compute_dtype=compute_dtype)
        return jnp.argmax(img_emb @ txt_emb.T, axis=1)

    return fwd


def retrieval_accuracy(params, spec, batches, compute_dtype=jnp.float32) -> float:
    """Image->text top-1 retrieval accuracy within each batch."""
    fwd = _retrieval_fwd(spec, compute_dtype)
    correct = total = 0
    for canv, a_h, a_w, idx, tokens in batches:
        pred = np.asarray(fwd(
            params, jnp.asarray(canv), jnp.asarray(a_h), jnp.asarray(a_w),
            jnp.asarray(idx), jnp.asarray(tokens),
        ))
        correct += int((pred == np.arange(len(pred))).sum())
        total += len(pred)
    return correct / max(total, 1)


def _save_train_state(path: Path, opt_state, epoch: int) -> None:
    """Optimizer moments + epoch counter, leaf-ordered (the tree structure
    is rebuilt from optimizer.init at load)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    flat = {f"opt_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    flat["epoch"] = np.asarray(epoch, np.int64)
    np.savez(path, **flat)


def _load_train_state(path: Path, template):
    """Restore optimizer state saved by _save_train_state; None on any
    mismatch (state from a different optimizer/model shape)."""
    try:
        with np.load(path, allow_pickle=False) as data:
            leaves, treedef = jax.tree_util.tree_flatten(template)
            loaded = [data[f"opt_{i}"] for i in range(len(leaves))]
            # t.shape reads device-array metadata; np.asarray(t) here
            # would FETCH every freshly-initialized Adam moment tree to
            # host through this rig's ~11 MB/s relay (~1.2 GB of zeros
            # for ViT-B/32, minutes of stall) just to learn the shapes
            if any(l.shape != t.shape for l, t in zip(loaded, leaves)):
                return None, 0
            return (
                jax.tree_util.tree_unflatten(treedef, loaded),
                int(data["epoch"]),
            )
    except Exception:
        return None, 0


def fit(
    spec: CLIPModelSpec,
    dataset,
    epochs: int = 1,
    learning_rate: float = 1e-5,
    params: dict | None = None,
    checkpoint_dir: str | Path | None = None,
    resume: bool = False,
    mesh=None,
    compute_dtype=jnp.float32,
    seed: int = 0,
    log_every: int = 10,
):
    """Train; returns (params, list of per-epoch mean losses)."""
    ckpt = Path(checkpoint_dir) / "clip.npz" if checkpoint_dir else None
    state_ckpt = (
        Path(checkpoint_dir) / "train_state.npz" if checkpoint_dir else None
    )
    resumed = False
    if params is None:
        if resume and ckpt and ckpt.exists():
            params, loaded_spec = load_params(ckpt)
            if loaded_spec != spec:
                raise ValueError("checkpoint spec mismatch")
            resumed = True
            log.info("resumed from %s", ckpt)
        else:
            params = init_params(jax.random.key(seed), spec)

    optimizer = make_optimizer(learning_rate=learning_rate)
    # donate params + opt_state: the step updates them functionally and
    # without donation the old and new buffers are both live every step
    # (~2x peak HBM for L/14-scale params + Adam moments).
    step = jax.jit(
        make_train_step(spec, optimizer, compute_dtype=compute_dtype),
        donate_argnums=(0, 1),
    )
    prep = jax.jit(
        lambda c, ah, aw, i: device_preprocess_indexed(
            c, ah, aw, i, out_dtype=compute_dtype
        )
    )

    if mesh is not None:
        params = jax.device_put(params, clip_param_shardings(mesh))
    opt_state = optimizer.init(params)
    if resumed and state_ckpt and state_ckpt.exists():
        # resume must restore the Adam moments too — re-initialized
        # moments give the first post-resume steps unscaled updates (a
        # loss spike uninterrupted runs don't have)
        restored, start_epoch = _load_train_state(state_ckpt, opt_state)
        if restored is not None:
            # preserve the template's shardings: a bare device_put would
            # land the Adam moments unsharded on one device (OOM at L/14
            # scale on a mesh)
            restored = jax.device_put(
                restored,
                jax.tree_util.tree_map(lambda x: x.sharding, opt_state),
            )
            opt_state = restored
            start_epoch += 1  # continue numbering after the saved epoch
            log.info("restored optimizer state from %s (epoch %d)",
                     state_ckpt, start_epoch)
        else:
            start_epoch = 0
    else:
        start_epoch = 0
    img_sharding = tok_sharding = None
    if mesh is not None:
        img_sharding, tok_sharding = batch_shardings(mesh)

    history = []
    for epoch in range(start_epoch, start_epoch + epochs):
        losses = []  # device scalars; fetched once per epoch (each
        # per-step float() would sync the pipeline on the dispatch floor)
        for i, (canv, a_h, a_w, idx, tokens) in enumerate(dataset.epoch()):
            images = prep(
                jnp.asarray(canv), jnp.asarray(a_h), jnp.asarray(a_w),
                jnp.asarray(idx),
            )
            tokens = jnp.asarray(tokens)
            if mesh is not None:
                images = jax.device_put(images, img_sharding)
                tokens = jax.device_put(tokens, tok_sharding)
            params, opt_state, loss = step(params, opt_state, images, tokens)
            losses.append(loss)
            if i % log_every == 0:
                log.info("epoch %d step %d loss %.4f", epoch, i, float(loss))
        mean_loss = (
            float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        )
        history.append(mean_loss)
        log.info("epoch %d done: mean loss %.4f", epoch, mean_loss)
        if ckpt:
            save_params(ckpt, jax.device_get(params), spec)
            _save_train_state(state_ckpt, jax.device_get(opt_state), epoch)
    return params, history
