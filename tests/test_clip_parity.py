"""Numerical parity of the JAX CLIP towers against a torch oracle.

No CLIP weights ship in this image (zero egress), so the oracle is a
RANDOM-INIT `transformers.CLIPModel` on CPU: its state_dict goes through our
HF converter and the resulting JAX embeddings must match torch's to tight
float32 tolerances. Because HF's CLIPModel is itself numerically equivalent
to the OpenAI release architecture, passing this transitively pins fidelity
to OpenAI checkpoints (SURVEY.md §4.1).

The OpenAI-naming converter is exercised on a synthetic state_dict with the
release's key layout, asserting it agrees with the HF-naming conversion of
the same underlying tensors.
"""

import numpy as np
import pytest

from evossearch_tpu.core.constants import CLIPModelSpec
from evossearch_tpu.models import (
    encode_image,
    encode_text,
    from_hf_state_dict,
    from_openai_state_dict,
    init_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# Tiny-but-nontrivial spec: 2 layers, 64 wide, 4 heads, 32px/16px patches.
TINY = CLIPModelSpec(
    name="tiny", image_size=32, patch_size=16,
    vision_width=64, vision_layers=2, vision_heads=4,
    text_width=48, text_layers=2, text_heads=4,
    vocab_size=512, context_length=16, embed_dim=40,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        projection_dim=TINY.embed_dim,
        vision_config=dict(
            image_size=TINY.image_size, patch_size=TINY.patch_size,
            hidden_size=TINY.vision_width, num_hidden_layers=TINY.vision_layers,
            num_attention_heads=TINY.vision_heads,
            intermediate_size=4 * TINY.vision_width, hidden_act="quick_gelu",
        ),
        text_config=dict(
            vocab_size=TINY.vocab_size, hidden_size=TINY.text_width,
            num_hidden_layers=TINY.text_layers, num_attention_heads=TINY.text_heads,
            intermediate_size=4 * TINY.text_width, hidden_act="quick_gelu",
            max_position_embeddings=TINY.context_length,
            # eos = top vocab id so torch's argmax pooling matches ours
            eos_token_id=TINY.vocab_size - 1,
        ),
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    return from_hf_state_dict(
        hf_model.state_dict(), TINY.vision_layers, TINY.text_layers
    )


def _rand_images(n=3):
    rng = np.random.default_rng(42)
    return rng.standard_normal((n, TINY.image_size, TINY.image_size, 3)).astype(
        np.float32
    )


def _rand_tokens(n=3):
    rng = np.random.default_rng(7)
    ctx = TINY.context_length
    toks = np.zeros((n, ctx), dtype=np.int64)
    for i in range(n):
        length = int(rng.integers(3, ctx - 1))
        toks[i, 0] = 1  # pseudo-SOT (any id < eos)
        toks[i, 1:length] = rng.integers(2, TINY.vocab_size - 2, size=length - 1)
        toks[i, length] = TINY.vocab_size - 1  # EOT = max id
    return toks


def test_image_tower_matches_torch(hf_model, jax_params):
    images = _rand_images()
    with torch.no_grad():
        # HF expects NCHW
        torch_emb = hf_model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    torch_emb /= np.linalg.norm(torch_emb, axis=-1, keepdims=True)
    jax_emb = np.asarray(encode_image(jax_params, images, TINY))
    np.testing.assert_allclose(jax_emb, torch_emb, atol=2e-5, rtol=1e-4)


def test_text_tower_matches_torch(hf_model, jax_params):
    toks = _rand_tokens()
    with torch.no_grad():
        torch_emb = hf_model.get_text_features(
            input_ids=torch.from_numpy(toks)
        ).numpy()
    torch_emb /= np.linalg.norm(torch_emb, axis=-1, keepdims=True)
    jax_emb = np.asarray(encode_text(jax_params, toks.astype(np.int32), TINY))
    np.testing.assert_allclose(jax_emb, torch_emb, atol=2e-5, rtol=1e-4)


def test_bfloat16_compute_close_to_f32(jax_params):
    import jax.numpy as jnp

    images = _rand_images()
    f32 = np.asarray(encode_image(jax_params, images, TINY))
    bf16 = np.asarray(
        encode_image(jax_params, images, TINY, compute_dtype=jnp.bfloat16)
    )
    cos = (f32 * bf16).sum(-1)
    assert (cos > 0.995).all(), cos


def _openai_sd_from_hf(hf_model):
    """Re-key the HF tiny model's tensors into the OpenAI release layout."""
    sd = hf_model.state_dict()
    out = {}
    out["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    out["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    out["visual.positional_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"
    ]
    out["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    out["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    out["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    out["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    out["visual.proj"] = sd["visual_projection.weight"].T
    out["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    out["positional_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"
    ]
    out["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    out["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    out["text_projection"] = sd["text_projection.weight"].T
    out["logit_scale"] = sd["logit_scale"]

    for hf_prefix, oa_prefix, n in [
        ("vision_model", "visual.transformer", TINY.vision_layers),
        ("text_model", "transformer", TINY.text_layers),
    ]:
        for i in range(n):
            h = f"{hf_prefix}.encoder.layers.{i}"
            o = f"{oa_prefix}.resblocks.{i}"
            out[f"{o}.ln_1.weight"] = sd[f"{h}.layer_norm1.weight"]
            out[f"{o}.ln_1.bias"] = sd[f"{h}.layer_norm1.bias"]
            out[f"{o}.ln_2.weight"] = sd[f"{h}.layer_norm2.weight"]
            out[f"{o}.ln_2.bias"] = sd[f"{h}.layer_norm2.bias"]
            out[f"{o}.attn.in_proj_weight"] = torch.cat(
                [
                    sd[f"{h}.self_attn.q_proj.weight"],
                    sd[f"{h}.self_attn.k_proj.weight"],
                    sd[f"{h}.self_attn.v_proj.weight"],
                ]
            )
            out[f"{o}.attn.in_proj_bias"] = torch.cat(
                [
                    sd[f"{h}.self_attn.q_proj.bias"],
                    sd[f"{h}.self_attn.k_proj.bias"],
                    sd[f"{h}.self_attn.v_proj.bias"],
                ]
            )
            out[f"{o}.attn.out_proj.weight"] = sd[f"{h}.self_attn.out_proj.weight"]
            out[f"{o}.attn.out_proj.bias"] = sd[f"{h}.self_attn.out_proj.bias"]
            out[f"{o}.mlp.c_fc.weight"] = sd[f"{h}.mlp.fc1.weight"]
            out[f"{o}.mlp.c_fc.bias"] = sd[f"{h}.mlp.fc1.bias"]
            out[f"{o}.mlp.c_proj.weight"] = sd[f"{h}.mlp.fc2.weight"]
            out[f"{o}.mlp.c_proj.bias"] = sd[f"{h}.mlp.fc2.bias"]
    return out


def test_openai_converter_agrees_with_hf_converter(hf_model, jax_params):
    import jax

    oa_params, spec = from_openai_state_dict(_openai_sd_from_hf(hf_model))
    assert spec.vision_width == TINY.vision_width
    assert spec.patch_size == TINY.patch_size
    for a, b in zip(
        jax.tree_util.tree_leaves(jax_params), jax.tree_util.tree_leaves(oa_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_init_params_forward_shapes():
    import jax

    params = init_params(jax.random.key(0), TINY)
    emb_i = encode_image(params, _rand_images(2), TINY)
    emb_t = encode_text(params, _rand_tokens(2).astype(np.int32), TINY)
    assert emb_i.shape == (2, TINY.embed_dim)
    assert emb_t.shape == (2, TINY.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb_i), axis=-1), 1.0, atol=1e-5
    )


# -- round 2: full-scale ViT-B/32 converter + parity (VERDICT item 6) --


@pytest.mark.slow
def test_full_scale_b32_converter_parity():
    """Converter + towers at FULL ViT-B/32 scale (release architecture:
    12L/768w/12h vision, 12L/512w/8h text, vocab 49408, ctx 77, embed 512)
    against the torch oracle — closes the tiny-spec-only gap. ~1.5 GB RAM,
    ~2 min on this host; random weights (no CLIP assets in image), which
    pins the numerics exactly as well as trained ones would."""
    from transformers import CLIPConfig, CLIPModel

    from evossearch_tpu.core import CLIP_MODEL_SPECS

    spec = CLIP_MODEL_SPECS["ViT-B/32"]
    cfg = CLIPConfig(
        projection_dim=spec.embed_dim,
        vision_config=dict(
            image_size=spec.image_size, patch_size=spec.patch_size,
            hidden_size=spec.vision_width, num_hidden_layers=spec.vision_layers,
            num_attention_heads=spec.vision_heads,
            intermediate_size=4 * spec.vision_width, hidden_act="quick_gelu",
        ),
        text_config=dict(
            vocab_size=spec.vocab_size, hidden_size=spec.text_width,
            num_hidden_layers=spec.text_layers,
            num_attention_heads=spec.text_heads,
            intermediate_size=4 * spec.text_width, hidden_act="quick_gelu",
            max_position_embeddings=spec.context_length,
            eos_token_id=49407,
        ),
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    params = from_hf_state_dict(
        model.state_dict(), spec.vision_layers, spec.text_layers
    )
    n_params = sum(
        int(np.prod(p.shape))
        for p in __import__("jax").tree_util.tree_leaves(params)
    )
    # release parameter count check (visual+text towers + projections)
    assert n_params == 151_277_313, n_params

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    toks = np.zeros((2, 77), np.int64)
    toks[:, 0] = 49406
    toks[0, 1:9] = rng.integers(2, 49000, 8)
    toks[0, 9] = 49407
    toks[1, 1:30] = rng.integers(2, 49000, 29)
    toks[1, 30] = 49407

    with torch.no_grad():
        t_img = model.get_image_features(
            pixel_values=torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
        t_txt = model.get_text_features(
            input_ids=torch.from_numpy(toks)
        ).numpy()
    t_img /= np.linalg.norm(t_img, axis=-1, keepdims=True)
    t_txt /= np.linalg.norm(t_txt, axis=-1, keepdims=True)

    j_img = np.asarray(encode_image(params, images, spec))
    j_txt = np.asarray(encode_text(params, toks.astype(np.int32), spec))

    cos_img = (j_img * t_img).sum(-1)
    cos_txt = (j_txt * t_txt).sum(-1)
    print(f"full-scale B/32 parity: cos_img={cos_img}, cos_txt={cos_txt}, "
          f"max_abs_img={np.abs(j_img - t_img).max():.2e}, "
          f"max_abs_txt={np.abs(j_txt - t_txt).max():.2e}")
    np.testing.assert_allclose(j_img, t_img, atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(j_txt, t_txt, atol=5e-5, rtol=1e-3)


def test_seq_merge_equivalent(jax_params):
    """seq_merge runs g images as one masked sequence; outputs must match
    the unmerged path (identical math — off-block softmax weights are
    exactly zero)."""
    images = np.concatenate([_rand_images(3), _rand_images(3)])  # B=6
    base = np.asarray(encode_image(jax_params, images, TINY))
    merged = np.asarray(encode_image(jax_params, images, TINY, seq_merge=2))
    np.testing.assert_allclose(merged, base, atol=2e-6, rtol=1e-5)
    merged3 = np.asarray(encode_image(jax_params, images, TINY, seq_merge=3))
    np.testing.assert_allclose(merged3, base, atol=2e-6, rtol=1e-5)
    with pytest.raises(ValueError):
        encode_image(jax_params, images[:5], TINY, seq_merge=2)
