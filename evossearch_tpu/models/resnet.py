"""CLIP modified-ResNet image tower — functional JAX, numerically faithful
to the OpenAI architecture (the reference reaches these models through
`clip.load(config.CLIP_MODEL)`, oldapp.py:28 — RN50/RN101/RN50x4/x16/x64
are all valid EVOSSEARCH_CLIP_MODEL values there).

OpenAI's ResNet differs from torchvision's in three ways this file
reproduces exactly:
  * 3-conv stem (3x3 s2 -> 3x3 -> 3x3, each BN+ReLU) + 2x2 average pool,
    instead of one 7x7 s2 conv + max pool;
  * anti-aliased downsampling: every stride lands as AvgPool2d(stride)
    followed by a stride-1 conv — in the residual branch (after conv2) AND
    in the shortcut (before its 1x1 conv);
  * attention pooling instead of global average pooling: the pooled query
    is the mean token, attended over all spatial positions + itself with a
    learned positional embedding and separate q/k/v/c projections.

TPU-first design notes:
  * Layout is NHWC end-to-end (XLA:TPU's native conv layout; the torch
    checkpoints' NCHW/OIHW tensors are transposed once at conversion).
  * Convs accumulate in float32 via ``preferred_element_type`` with
    activations in the configurable compute dtype (bfloat16 on TPU).
  * BatchNorm is inference-mode (running stats folded into one scale/bias
    pair per channel AT TRACE TIME — f32 math, zero runtime cost beyond a
    fused multiply-add). The raw gamma/beta/mean/var are kept in the
    pytree so checkpoints round-trip losslessly.
  * Within each stage, blocks 1..n-1 share shapes, so their params are
    STACKED and the tail runs under ``lax.scan`` — one traced body per
    stage regardless of depth (RN50x64's 36-deep stage 3 compiles as fast
    as RN50's 6-deep one).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import CLIPResNetSpec

BN_EPS = 1e-5  # torch BatchNorm2d default, used by the OpenAI release


def _conv(x: jax.Array, kernel: jax.Array, stride: int, padding: int) -> jax.Array:
    """NHWC conv, kernel (kh, kw, in, out), f32 accumulation."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _bn(params: dict, x: jax.Array) -> jax.Array:
    """Inference BatchNorm: y = (x - mean) * rsqrt(var + eps) * gamma + beta,
    folded to one per-channel scale/bias in f32 at trace time."""
    inv = jax.lax.rsqrt(params["var"].astype(jnp.float32) + BN_EPS)
    scale = params["scale"].astype(jnp.float32) * inv
    bias = (
        params["bias"].astype(jnp.float32)
        - params["mean"].astype(jnp.float32) * scale
    )
    y = x.astype(jnp.float32) * scale + bias
    return y.astype(x.dtype)


def _avg_pool(x: jax.Array, stride: int) -> jax.Array:
    """AvgPool2d(stride): kernel == stride, VALID — torch floor semantics."""
    if stride == 1:
        return x
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, stride, stride, 1), (1, stride, stride, 1), "VALID",
    )
    return (summed / (stride * stride)).astype(x.dtype)


def _bottleneck(params: dict, x: jax.Array, stride: int) -> jax.Array:
    """OpenAI Bottleneck (expansion 4): 1x1 -> 3x3 -> [avgpool] -> 1x1,
    BN after every conv, ReLU after bn1/bn2 and after the residual add."""
    out = jax.nn.relu(_bn(params["bn1"], _conv(x, params["conv1"]["kernel"], 1, 0)))
    out = jax.nn.relu(_bn(params["bn2"], _conv(out, params["conv2"]["kernel"], 1, 1)))
    out = _avg_pool(out, stride)
    out = _bn(params["bn3"], _conv(out, params["conv3"]["kernel"], 1, 0))
    if "downsample" in params:
        identity = _avg_pool(x, stride)
        identity = _bn(
            params["downsample"]["bn"],
            _conv(identity, params["downsample"]["conv"]["kernel"], 1, 0),
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _stage(params: dict, x: jax.Array, stride: int, remat: bool) -> jax.Array:
    """Block 0 carries the stride + shortcut projection; the homogeneous
    tail (params["rest"], stacked on a leading axis) runs under lax.scan."""
    blk = (
        jax.checkpoint(_bottleneck, static_argnums=(2,)) if remat else _bottleneck
    )
    x = blk(params["down"], x, stride)
    if params.get("rest") is not None:
        def body(h, block_params):
            return blk(block_params, h, 1), None

        x, _ = jax.lax.scan(body, x, params["rest"])
    return x


def _attn_pool(params: dict, x: jax.Array, heads: int) -> jax.Array:
    """AttentionPool2d: (B, H, W, C) -> (B, output_dim).

    Query = the mean over spatial positions (token 0 after concat); keys/
    values = [mean; positions], all offset by a learned positional
    embedding. Runs in f32 — it is one token of attention, numerically
    load-bearing (it IS the embedding) and costs nothing.
    """
    B, H, W, C = x.shape
    t = x.reshape(B, H * W, C).astype(jnp.float32)
    t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
    t = t + params["pos_embed"].astype(jnp.float32)[None]
    q = t[:, :1] @ params["wq"] + params["bq"]  # (B, 1, C)
    k = t @ params["wk"] + params["bk"]  # (B, T, C)
    v = t @ params["wv"] + params["bv"]
    head_dim = C // heads
    q = q.reshape(B, 1, heads, head_dim)
    k = k.reshape(B, -1, heads, head_dim)
    v = v.reshape(B, -1, heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, C)
    return out @ params["wc"] + params["bc"]  # (B, output_dim)


def encode_image_resnet(
    params: dict, images: jax.Array, spec: CLIPResNetSpec,
    compute_dtype=jnp.float32, normalize: bool = True, remat: bool = False,
) -> jax.Array:
    """images: (B, image_size, image_size, 3), preprocessed (normalized).
    Returns (B, embed_dim) float32, L2-normalized by default."""
    v = params["visual"]
    x = images.astype(compute_dtype)
    # stem: conv s2 -> conv -> conv (BN+ReLU each) -> 2x2 avg pool
    stem = v["stem"]
    x = jax.nn.relu(_bn(stem["bn1"], _conv(x, stem["conv1"]["kernel"], 2, 1)))
    x = jax.nn.relu(_bn(stem["bn2"], _conv(x, stem["conv2"]["kernel"], 1, 1)))
    x = jax.nn.relu(_bn(stem["bn3"], _conv(x, stem["conv3"]["kernel"], 1, 1)))
    x = _avg_pool(x, 2)
    for i, stride in enumerate((1, 2, 2, 2)):
        x = _stage(v[f"stage{i + 1}"], x, stride, remat)
    emb = _attn_pool(v["attnpool"], x, spec.vision_heads)  # f32
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


# -------------------------------------------------------------------- init


def _init_bn(c: int) -> dict:
    return {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _init_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> dict:
    fan_in = kh * kw * cin
    return {"kernel": jax.random.normal(key, (kh, kw, cin, cout)) * fan_in ** -0.5}


def _init_block(key: jax.Array, cin: int, planes: int, downsample: bool) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _init_conv(ks[0], 1, 1, cin, planes),
        "bn1": _init_bn(planes),
        "conv2": _init_conv(ks[1], 3, 3, planes, planes),
        "bn2": _init_bn(planes),
        "conv3": _init_conv(ks[2], 1, 1, planes, planes * 4),
        # zero-init the last BN gamma of each block (OpenAI
        # initialize_parameters: residual branches start as identity)
        "bn3": {**_init_bn(planes * 4), "scale": jnp.zeros((planes * 4,))},
    }
    if downsample:
        p["downsample"] = {
            "conv": _init_conv(ks[3], 1, 1, cin, planes * 4),
            "bn": _init_bn(planes * 4),
        }
    return p


def init_visual_resnet(key: jax.Array, spec: CLIPResNetSpec) -> dict:
    w = spec.vision_width
    k_stem, k_pool, *k_stages = jax.random.split(key, 6)
    ks = jax.random.split(k_stem, 3)
    visual = {
        "stem": {
            "conv1": _init_conv(ks[0], 3, 3, 3, w // 2),
            "bn1": _init_bn(w // 2),
            "conv2": _init_conv(ks[1], 3, 3, w // 2, w // 2),
            "bn2": _init_bn(w // 2),
            "conv3": _init_conv(ks[2], 3, 3, w // 2, w),
            "bn3": _init_bn(w),
        },
    }
    cin = w
    for i, n_blocks in enumerate(spec.vision_layers):
        planes = w * (2 ** i)
        kd, kr = jax.random.split(k_stages[i])
        stage = {"down": _init_block(kd, cin, planes, downsample=True)}
        cin = planes * 4
        if n_blocks > 1:  # single-block stages simply omit the "rest" key
            rest = [
                _init_block(k, cin, planes, downsample=False)
                for k in jax.random.split(kr, n_blocks - 1)
            ]
            stage["rest"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *rest
            )
        visual[f"stage{i + 1}"] = stage
    C = spec.attn_dim
    kp = jax.random.split(k_pool, 5)
    std = C ** -0.5  # OpenAI initialize_parameters attnpool std
    visual["attnpool"] = {
        "pos_embed": jax.random.normal(
            kp[0], (spec.num_image_tokens, C)
        ) * std,
        "wq": jax.random.normal(kp[1], (C, C)) * std,
        "bq": jnp.zeros((C,)),
        "wk": jax.random.normal(kp[2], (C, C)) * std,
        "bk": jnp.zeros((C,)),
        "wv": jax.random.normal(kp[3], (C, C)) * std,
        "bv": jnp.zeros((C,)),
        "wc": jax.random.normal(kp[4], (C, spec.embed_dim)) * std,
        "bc": jnp.zeros((spec.embed_dim,)),
    }
    return visual


def expected_visual_param_count(spec: CLIPResNetSpec) -> int:
    """Analytic parameter count of the visual tower (incl. BN buffers,
    which live in our pytree; excl. torch's num_batches_tracked)."""
    w = spec.vision_width

    def bn(c):
        return 4 * c

    total = (
        3 * 3 * 3 * (w // 2) + bn(w // 2)
        + 3 * 3 * (w // 2) * (w // 2) + bn(w // 2)
        + 3 * 3 * (w // 2) * w + bn(w)
    )
    cin = w
    for i, n_blocks in enumerate(spec.vision_layers):
        planes = w * (2 ** i)
        for b in range(n_blocks):
            c_in = cin if b == 0 else planes * 4
            total += c_in * planes + bn(planes)  # conv1
            total += 3 * 3 * planes * planes + bn(planes)  # conv2
            total += planes * planes * 4 + bn(planes * 4)  # conv3
            if b == 0:
                total += c_in * planes * 4 + bn(planes * 4)  # downsample
        cin = planes * 4
    C = spec.attn_dim
    total += spec.num_image_tokens * C  # pos embed
    total += 3 * (C * C + C)  # q/k/v proj
    total += C * spec.embed_dim + spec.embed_dim  # c_proj
    return total
