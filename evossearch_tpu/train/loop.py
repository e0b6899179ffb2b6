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


def retrieval_accuracy(params, spec, batches, compute_dtype=jnp.float32) -> float:
    """Image->text top-1 retrieval accuracy within each batch."""
    correct = total = 0
    for canv, a_h, a_w, idx, tokens in batches:
        images = device_preprocess_indexed(
            jnp.asarray(canv), jnp.asarray(a_h), jnp.asarray(a_w),
            jnp.asarray(idx), out_dtype=compute_dtype,
        )
        img_emb = encode_image(params, images, spec, compute_dtype=compute_dtype)
        txt_emb = encode_text(
            params, jnp.asarray(tokens), spec, compute_dtype=compute_dtype
        )
        pred = np.asarray(jnp.argmax(img_emb @ txt_emb.T, axis=1))
        correct += int((pred == np.arange(len(pred))).sum())
        total += len(pred)
    return correct / max(total, 1)


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
    if params is None:
        if resume and ckpt and ckpt.exists():
            params, loaded_spec = load_params(ckpt)
            if loaded_spec != spec:
                raise ValueError("checkpoint spec mismatch")
            log.info("resumed from %s", ckpt)
        else:
            params = init_params(jax.random.key(seed), spec)

    optimizer = make_optimizer(learning_rate=learning_rate)
    step = jax.jit(make_train_step(spec, optimizer, compute_dtype=compute_dtype))
    prep = jax.jit(
        lambda c, ah, aw, i: device_preprocess_indexed(
            c, ah, aw, i, out_dtype=compute_dtype
        )
    )

    if mesh is not None:
        params = jax.device_put(params, clip_param_shardings(mesh))
    opt_state = optimizer.init(params)
    img_sharding = tok_sharding = None
    if mesh is not None:
        img_sharding, tok_sharding = batch_shardings(mesh)

    history = []
    for epoch in range(epochs):
        losses = []
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
            losses.append(float(loss))
            if i % log_every == 0:
                log.info("epoch %d step %d loss %.4f", epoch, i, losses[-1])
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        history.append(mean_loss)
        log.info("epoch %d done: mean loss %.4f", epoch, mean_loss)
        if ckpt:
            save_params(ckpt, jax.device_get(params), spec)
    return params, history
