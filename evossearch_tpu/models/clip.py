"""CLIP image + text towers — functional JAX, numerically faithful to the
OpenAI architecture (consumed by the reference via `model.encode_image` /
`model.encode_text`, oldapp.py:34/50).

Architecture (ViT-B/32 example; table in core/constants.py):
  image: 224x224x3 -> 32x32 patchify-matmul (bias-free, like OpenAI's conv1)
         -> +class token -> +pos embed -> ln_pre -> 12 pre-LN blocks
         -> ln_post(CLS) -> proj(768->512)
  text:  77 token ids -> token+pos embed -> 12 causal pre-LN blocks
         -> ln_final -> pooled at EOT position (argmax of ids, EOT=49407)
         -> text_projection(512->512)

The patch embedding is expressed as reshape+matmul instead of a strided
convolution: for non-overlapping patches the two are identical, and a plain
GEMM maps straight onto the MXU without convolution lowering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import CLIPModelSpec
from .layers import TowerConfig, init_tower_params, layer_norm, transformer


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, gh*gw, patch*patch*3), flattened (ph, pw, c).

    The flatten order matches a conv kernel (out,in,kh,kw) transposed to
    (kh,kw,in,out) and reshaped — see converters in convert.py.
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B gh gw ph pw c
    return x.reshape(B, gh * gw, patch * patch * C)


def _patch_embed(images: jax.Array, kernel: jax.Array, patch: int) -> jax.Array:
    """Patchify + embed as ONE einsum: (B, H, W, C) -> (B, gh*gw, width).

    Mathematically identical to ``_patchify`` followed by a matmul, but
    the (ph, pw) gather folds into the GEMM's input indexing instead of
    materializing a 6-D transpose — measured ~7x faster at ViT-B/32
    batch 512 on v5e (the standalone transpose lowers to strided copies).
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x6 = images.reshape(B, gh, patch, gw, patch, C)
    k4 = kernel.reshape(patch, patch, C, kernel.shape[-1]).astype(images.dtype)
    out = jnp.einsum(
        "bhpwqc,pqck->bhwk", x6, k4, preferred_element_type=jnp.float32
    )
    return out.reshape(B, gh * gw, kernel.shape[-1])


def _merge_mask(g: int, t: int) -> jax.Array:
    """(1, 1, g*t, g*t) additive f32 block-diagonal mask: token i of image a
    may attend token j of image b iff a == b. Off-block logits get f32 min,
    which softmax maps to EXACTLY zero weight (exp underflows), so merged
    attention computes the same values as per-image attention."""
    import numpy as np

    m = np.full((g * t, g * t), float(np.finfo(np.float32).min), np.float32)
    for i in range(g):
        m[i * t : (i + 1) * t, i * t : (i + 1) * t] = 0.0
    return jnp.asarray(m)[None, None, :, :]


def encode_image(
    params: dict, images: jax.Array, spec: CLIPModelSpec,
    compute_dtype=jnp.float32, normalize: bool = True, remat: bool = False,
    seq_merge: int = 1,
) -> jax.Array:
    """images: (B, image_size, image_size, 3), preprocessed (normalized).

    Returns (B, embed_dim) float32 embeddings, L2-normalized by default
    (the reference normalizes at oldapp.py:35).

    ``seq_merge=g`` runs g images as ONE masked sequence through the
    transformer (B must be divisible by g). Short ViT sequences (50 tokens
    at B/32) underfeed the MXU's 128-wide tiles in the attention batched
    matmuls; merging 2 images into a 100-token masked sequence measured
    1.57x faster on the tower at batch 512 on v5e. The block-diagonal
    mask keeps the math identical per image (see _merge_mask).

    ResNet-family specs (RN50 etc.) dispatch to the modified-ResNet tower
    in resnet.py; seq_merge is a ViT-only optimization there.
    """
    if spec.family == "resnet":
        if seq_merge != 1:
            raise ValueError("seq_merge applies to ViT towers only")
        from .resnet import encode_image_resnet

        return encode_image_resnet(
            params, images, spec, compute_dtype=compute_dtype,
            normalize=normalize, remat=remat,
        )
    v = params["visual"]
    cfg = TowerConfig(
        width=spec.vision_width, layers=spec.vision_layers,
        heads=spec.vision_heads, causal=False, remat=remat,
    )
    x = _patch_embed(
        images.astype(compute_dtype), v["patch_embed"]["kernel"],
        spec.patch_size,
    ).astype(compute_dtype)
    cls = jnp.broadcast_to(
        v["class_embedding"].astype(compute_dtype), (x.shape[0], 1, spec.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_embed"].astype(compute_dtype)
    x = layer_norm(v["ln_pre"], x)
    b, t, w = x.shape
    mask = None
    if seq_merge > 1:
        if b % seq_merge:
            raise ValueError(f"batch {b} not divisible by seq_merge={seq_merge}")
        x = x.reshape(b // seq_merge, seq_merge * t, w)
        mask = _merge_mask(seq_merge, t)
    x = transformer(v["blocks"], x, cfg, mask)
    if seq_merge > 1:
        x = x.reshape(b, t, w)
    pooled = layer_norm(v["ln_post"], x[:, 0, :]).astype(jnp.float32)
    emb = pooled @ v["proj"].astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


def encode_text(
    params: dict, tokens: jax.Array, spec: CLIPModelSpec,
    compute_dtype=jnp.float32, normalize: bool = True, remat: bool = False,
) -> jax.Array:
    """tokens: (B, context_length) int32. Returns (B, embed_dim) float32."""
    t = params["text"]
    cfg = TowerConfig(
        width=spec.text_width, layers=spec.text_layers,
        heads=spec.text_heads, causal=True, remat=remat,
    )
    x = t["token_embed"][tokens].astype(compute_dtype)
    x = x + t["pos_embed"].astype(compute_dtype)
    x = transformer(t["blocks"], x, cfg)
    x = layer_norm(t["ln_final"], x).astype(jnp.float32)
    # Pool at the EOT token: EOT has the highest id in the vocab, so argmax
    # over ids finds its position (OpenAI semantics).
    eot_pos = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0, :]
    emb = pooled @ t["proj"].astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


def _init_text(kt, kte, ktb, kpt, spec) -> dict:
    """Text tower init — shared by the ViT and ResNet variants (the OpenAI
    release pairs BOTH image-tower families with this same transformer)."""
    tw = spec.text_width
    return {
        "token_embed": jax.random.normal(kt, (spec.vocab_size, tw)) * 0.02,
        "pos_embed": jax.random.normal(kte, (spec.context_length, tw)) * 0.01,
        "blocks": init_tower_params(
            ktb,
            TowerConfig(
                width=tw, layers=spec.text_layers, heads=spec.text_heads,
                causal=True,
            ),
        ),
        "ln_final": {"scale": jnp.ones((tw,)), "bias": jnp.zeros((tw,))},
        "proj": jax.random.normal(kpt, (tw, spec.embed_dim)) * (tw ** -0.5),
    }


def init_params(key: jax.Array, spec: CLIPModelSpec) -> dict:
    """Random-init full CLIP param pytree (OpenAI init scheme)."""
    # 9 distinct keys: reusing one key for two draws makes the underlying
    # random streams identical (counter-based PRNG), correlating e.g. the
    # visual and text positional embeddings at from-scratch training init.
    kv, kt, kp, kc, ke, kpv, kpt, kte, ktb = jax.random.split(key, 9)
    if spec.family == "resnet":
        from .resnet import init_visual_resnet

        return {
            "visual": init_visual_resnet(kv, spec),
            "text": _init_text(kt, kte, ktb, kpt, spec),
            "logit_scale": jnp.asarray(jnp.log(1 / 0.07), dtype=jnp.float32),
        }
    vw, tw = spec.vision_width, spec.text_width
    patch_dim = spec.patch_size * spec.patch_size * 3
    return {
        "visual": {
            "patch_embed": {
                "kernel": jax.random.normal(kp, (patch_dim, vw)) * (vw ** -0.5)
            },
            "class_embedding": jax.random.normal(kc, (vw,)) * (vw ** -0.5),
            "pos_embed": jax.random.normal(ke, (spec.num_image_tokens, vw))
            * (vw ** -0.5),
            "ln_pre": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
            "blocks": init_tower_params(
                kv,
                TowerConfig(width=vw, layers=spec.vision_layers, heads=spec.vision_heads),
            ),
            "ln_post": {"scale": jnp.ones((vw,)), "bias": jnp.zeros((vw,))},
            "proj": jax.random.normal(kpv, (vw, spec.embed_dim)) * (vw ** -0.5),
        },
        "text": _init_text(kt, kte, ktb, kpt, spec),
        "logit_scale": jnp.asarray(jnp.log(1 / 0.07), dtype=jnp.float32),
    }


def count_params(params: dict) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def expected_param_count(spec: CLIPModelSpec) -> int:
    """Analytic parameter count for a spec (sanity anchor: ViT-B/32 ==
    151,277,313 and ViT-B/16 == 149,620,737, the OpenAI release counts).
    ResNet-family pytrees additionally carry the BN running stats that
    torch keeps as buffers; the count here matches OUR pytree."""

    def tower(width: int, layers: int) -> int:
        attn = width * 3 * width + 3 * width + width * width + width
        mlp = width * 4 * width + 4 * width + 4 * width * width + width
        lns = 2 * (2 * width)
        return layers * (attn + mlp + lns)

    vw, tw = spec.vision_width, spec.text_width
    if spec.family == "resnet":
        from .resnet import expected_visual_param_count

        visual = expected_visual_param_count(spec)
    else:
        visual = (
            spec.patch_size * spec.patch_size * 3 * vw  # patch embed (no bias)
            + vw  # class embedding
            + spec.num_image_tokens * vw  # pos embed
            + 2 * vw + 2 * vw  # ln_pre + ln_post
            + tower(vw, spec.vision_layers)
            + vw * spec.embed_dim  # projection
        )
    text = (
        spec.vocab_size * tw
        + spec.context_length * tw
        + 2 * tw  # ln_final
        + tower(tw, spec.text_layers)
        + tw * spec.embed_dim
    )
    return visual + text + 1  # + logit_scale
