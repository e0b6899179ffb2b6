"""Transformer building blocks for the CLIP towers — functional JAX.

Design notes (TPU-first):
  * Params are plain pytrees of jnp arrays; per-layer params are STACKED
    along a leading axis and the block stack runs under ``jax.lax.scan`` —
    one traced block body regardless of depth (fast compiles, and the
    stacked arrays take pjit shardings naturally).
  * Matmuls run in a configurable compute dtype (bfloat16 on TPU) with
    float32 accumulation via ``preferred_element_type``; LayerNorm runs in
    float32 for numerical fidelity to the OpenAI checkpoints.
  * CLIP uses quick-GELU (``x * sigmoid(1.702 x)``), NOT tanh-GELU — a key
    parity hazard (SURVEY.md §7 "hard parts").

Reference behavior being reproduced: the upstream OpenAI CLIP transformer
(used via `model.encode_image`/`encode_text`, reference oldapp.py:34/50).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # OpenAI/HF CLIP LayerNorm epsilon


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    """Shape info one transformer tower needs at trace time. (Compute dtype
    is a property of the activations flowing in, not of the config.)"""

    width: int
    layers: int
    heads: int
    causal: bool = False
    remat: bool = False  # rematerialize block activations (training)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(params: dict, x: jax.Array) -> jax.Array:
    """LayerNorm in float32 regardless of compute dtype."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def _dense(x: jax.Array, kernel: jax.Array, bias: jax.Array | None) -> jax.Array:
    y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def attention(
    params: dict, x: jax.Array, heads: int, causal: bool,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Multi-head self-attention. x: (B, T, W).

    q/k/v projections run as ONE (W, 3W) GEMM (params["wqkv"]) — measured
    ~12% faster than three separate GEMMs on v5e at ViT-B/32 shapes, and
    numerically identical.

    ``mask``: optional additive (1, 1, T, T) float32 logits mask (used by
    the sequence-merge optimization in clip.py to run several images as
    one masked sequence).
    """
    B, T, W = x.shape
    head_dim = W // heads
    qkv = _dense(x, params["wqkv"], params["bqkv"])  # (B, T, 3W)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, heads, head_dim)
    k = k.reshape(B, T, heads, head_dim)
    v = v.reshape(B, T, heads, head_dim)

    # (B, H, T, T) logits in float32 — T <= 257 for every CLIP variant, so
    # a full attention matrix is small. Flash-style tiling was MEASURED
    # and rejected twice: the TPU pallas flash kernel (padded T=384,
    # segment-id masking) runs ViT-L/14 at 284 img/s vs 606 for this core
    # on v5e — its blocking is tuned for training-scale sequences, not
    # 257-token inference — and a hand-rolled variant did no better.
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (head_dim ** -0.5)
    if mask is not None:
        logits = logits + mask
    if causal:
        causal_mask = jnp.tril(jnp.ones((T, T), dtype=bool))
        logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, T, W)
    return _dense(out, params["wo"], params["bo"])


def mlp(params: dict, x: jax.Array) -> jax.Array:
    h = _dense(x, params["w1"], params["b1"])
    h = quick_gelu(h)
    return _dense(h, params["w2"], params["b2"])


def block(
    params: dict, x: jax.Array, heads: int, causal: bool,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Pre-LN residual transformer block (OpenAI CLIP ordering)."""
    x = x + attention(
        params["attn"], layer_norm(params["ln_1"], x), heads, causal, mask
    )
    x = x + mlp(params["mlp"], layer_norm(params["ln_2"], x))
    return x


def transformer(
    stacked_params: dict, x: jax.Array, cfg: TowerConfig,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Run `cfg.layers` blocks whose params are stacked on a leading axis."""
    fn = jax.checkpoint(block, static_argnums=(2, 3)) if cfg.remat else block

    def body(h, layer_params):
        return fn(layer_params, h, cfg.heads, cfg.causal, mask), None

    x, _ = jax.lax.scan(body, x, stacked_params)
    return x


# -- initializers (match OpenAI CLIP's init scheme closely enough for
#    from-scratch training; converted checkpoints overwrite these anyway) --


def _init_ln(width: int) -> dict:
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def init_tower_params(key: jax.Array, cfg: TowerConfig) -> dict:
    """Stacked per-layer params for one transformer tower."""
    W, L = cfg.width, cfg.layers
    proj_std = (W ** -0.5) * ((2 * L) ** -0.5)
    attn_std = W ** -0.5
    fc_std = (2 * W) ** -0.5
    ks = jax.random.split(key, 6)

    def stack_ln():
        return {"scale": jnp.ones((L, W)), "bias": jnp.zeros((L, W))}

    return {
        "ln_1": stack_ln(),
        "attn": {
            "wqkv": jax.random.normal(ks[0], (L, W, 3 * W)) * attn_std,
            "bqkv": jnp.zeros((L, 3 * W)),
            "wo": jax.random.normal(ks[3], (L, W, W)) * proj_std,
            "bo": jnp.zeros((L, W)),
        },
        "ln_2": stack_ln(),
        "mlp": {
            "w1": jax.random.normal(ks[4], (L, W, 4 * W)) * fc_std,
            "b1": jnp.zeros((L, 4 * W)),
            "w2": jax.random.normal(ks[5], (L, 4 * W, W)) * proj_std,
            "b2": jnp.zeros((L, W)),
        },
    }
