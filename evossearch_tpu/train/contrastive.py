"""Contrastive (CLIP-style) training on a TPU mesh.

The reference has no training at all (weights come from `clip.load`,
oldapp.py:28); this module makes the framework self-sufficient: fine-tune or
train the towers with the standard InfoNCE objective, data-parallel over a
``data`` mesh axis and tensor-parallel over a ``model`` axis.

Idiomatic-JAX scaling: the train step is written as GLOBAL math; parallelism
comes entirely from sharding annotations (params sharded per
``clip_param_shardings``, batch sharded on ``data``), and XLA inserts the
ICI collectives (all-gather for cross-device negatives, all-reduce for
tensor-parallel partials and gradient sums). No hand-written collectives.

Pipeline/sequence/expert parallelism are deliberately absent: CLIP towers
are 12-24 layers of fixed 77/50-257-token sequences — there is no workload
axis for them (SURVEY.md §2 parallelism table).

Remat policy (measured on v5e, ViT-B/32 bf16 batch 256, round 4): full
per-block ``jax.checkpoint`` = 1512 pairs/s; ``dots_with_no_batch_dims_
saveable`` = 1242 pairs/s (saving GEMM outputs costs more HBM traffic
than recomputing them at these 50/77-token sequences); no-remat fails to
compile at batch 256 (activations + donated f32 AdamW state exceed HBM).
Full remat stays the default — it is the fastest variant that fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.constants import CLIPModelSpec
from ..models import encode_image, encode_text

DATA_AXIS = "data"
MODEL_AXIS = "model"


def clip_loss(params, images, tokens, spec, compute_dtype=jnp.float32,
              remat: bool = True):
    """Symmetric InfoNCE over the (global) batch."""
    img_emb = encode_image(
        params, images, spec, compute_dtype=compute_dtype, remat=remat
    )
    txt_emb = encode_text(
        params, tokens, spec, compute_dtype=compute_dtype, remat=remat
    )
    # OpenAI clamps the learned temperature at 100.
    scale = jnp.minimum(jnp.exp(params["logit_scale"]), 100.0)
    logits = scale * (img_emb @ txt_emb.T)
    labels = jnp.arange(logits.shape[0])
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (loss_i.mean() + loss_t.mean())


# Param leaf names excluded from weight decay (CLIP/AdamW convention: no
# decay on gains or biases; logit_scale is a temperature, not a weight).
_NO_DECAY_NAMES = frozenset(
    {"scale", "bias", "bqkv", "bo", "b1", "b2", "class_embedding",
     "logit_scale"}
)


def decay_mask(params) -> dict:
    """True where AdamW weight decay applies (kernels/embeddings only)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: getattr(path[-1], "key", path[-1])
        not in _NO_DECAY_NAMES,
        params,
    )


def make_optimizer(
    learning_rate: float = 1e-5, weight_decay: float = 0.2,
    b1: float = 0.9, b2: float = 0.98, eps: float = 1e-6,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with the CLIP-paper hyperparameter shape; decay masked off
    LayerNorm gains, biases, and logit_scale (CLIP convention)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mask=decay_mask),
    )


def make_train_step(spec: CLIPModelSpec, optimizer, compute_dtype=jnp.float32,
                    remat: bool = True):
    """(params, opt_state, images, tokens) -> (params, opt_state, loss).

    jit this under a mesh with sharded inputs; the function itself is
    parallelism-agnostic.
    """
    if getattr(spec, "family", "vit") == "resnet":
        # The RN* towers run inference-mode BatchNorm (models/resnet.py):
        # training them would require batch-stats updates plus masking the
        # running mean/var out of the optimizer — and the loss would
        # happily push gradients into those statistics. The reference has
        # no training at all (SURVEY §2), so fine-tuning stays ViT-only.
        raise NotImplementedError(
            "contrastive training supports the ViT family only; the "
            f"ResNet tower ({spec.name}) uses frozen inference BatchNorm"
        )

    def train_step(params, opt_state, images, tokens):
        loss, grads = jax.value_and_grad(clip_loss)(
            params, images, tokens, spec, compute_dtype, remat
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


# ---------------------------------------------------------------- shardings


def _tower_specs() -> dict:
    """PartitionSpecs for one stacked transformer tower (leading = layer).

    Megatron-style tensor parallel: qkv/fc1 shard the OUTPUT feature dim,
    out_proj/fc2 shard the INPUT feature dim, so each block needs exactly
    one all-reduce per sublayer.
    """
    return {
        "ln_1": {"scale": P(None, None), "bias": P(None, None)},
        "attn": {
            # fused qkv: shard the 3W output dim; GSPMD reshards around the
            # in-kernel split, keeping correctness (cost: one extra
            # collective vs per-projection sharding)
            "wqkv": P(None, None, MODEL_AXIS), "bqkv": P(None, MODEL_AXIS),
            "wo": P(None, MODEL_AXIS, None), "bo": P(None, None),
        },
        "ln_2": {"scale": P(None, None), "bias": P(None, None)},
        "mlp": {
            "w1": P(None, None, MODEL_AXIS), "b1": P(None, MODEL_AXIS),
            "w2": P(None, MODEL_AXIS, None), "b2": P(None, None),
        },
    }


def clip_param_specs() -> dict:
    """PartitionSpec pytree matching models.clip.init_params structure."""
    return {
        "visual": {
            "patch_embed": {"kernel": P(None, MODEL_AXIS)},
            "class_embedding": P(None),
            "pos_embed": P(None, None),
            "ln_pre": {"scale": P(None), "bias": P(None)},
            "blocks": _tower_specs(),
            "ln_post": {"scale": P(None), "bias": P(None)},
            "proj": P(None, None),
        },
        "text": {
            "token_embed": P(None, None),
            "pos_embed": P(None, None),
            "blocks": _tower_specs(),
            "ln_final": {"scale": P(None), "bias": P(None)},
            "proj": P(None, None),
        },
        "logit_scale": P(),
    }


def clip_param_shardings(mesh: Mesh) -> dict:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        clip_param_specs(),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_shardings(mesh: Mesh):
    """(images, tokens) shardings: batch split over the data axis."""
    return (
        NamedSharding(mesh, P(DATA_AXIS, None, None, None)),
        NamedSharding(mesh, P(DATA_AXIS, None)),
    )


def train_mesh(n_devices: int = 0, model_parallel: int = 1,
               devices=None) -> Mesh:
    """(data, model) mesh over the available devices."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by tp={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
