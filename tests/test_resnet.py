"""CLIP modified-ResNet family: numerical parity against a torch oracle,
converter round-trips, and engine integration.

The reference reaches RN50/RN101/RN50x4/x16/x64 through
`clip.load(config.CLIP_MODEL)` (oldapp.py:28, config.py:25) — any of them
is a valid EVOSSEARCH_CLIP_MODEL there, so the family is part of the
capability surface. No CLIP weights ship in this image (zero egress), so
the oracle is a from-scratch torch implementation of the OpenAI
ModifiedResNet (mirroring clip/model.py's architecture AND state_dict key
layout exactly); random weights pin the numerics as well as trained ones.
"""

import numpy as np
import pytest

from evossearch_tpu.core import CLIP_MODEL_SPECS, CLIPResNetSpec
from evossearch_tpu.models import (
    count_params,
    encode_image,
    expected_param_count,
    init_params,
)
from evossearch_tpu.models.convert import (
    from_openai_state_dict,
    infer_openai_resnet_spec,
)

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

# Tiny-but-nontrivial: multi-block AND single-block stages, 64px -> 2x2
# final grid. attn_dim = 16*32 = 512, attnpool heads = 16*32//64 = 8.
TINY_RN = CLIPResNetSpec(
    name="tiny-rn", image_size=64,
    vision_width=16, vision_layers=(2, 1, 1, 2), vision_heads=8,
    text_width=48, text_layers=2, text_heads=4,
    vocab_size=512, context_length=16, embed_dim=32,
)


# ------------------------------------------------------------ torch oracle
# Faithful re-statement of OpenAI clip/model.py's ModifiedResNet with the
# SAME module/buffer names, so `.state_dict()` has the release key layout.


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            from collections import OrderedDict

            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride)),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        out = out + identity
        return self.relu(out)


class _AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :].to(x.dtype)
        x, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=False, need_weights=False,
        )
        return x.squeeze(0)


class _ModifiedResNet(nn.Module):
    def __init__(self, layers, output_dim, heads, input_resolution, width):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        self.attnpool = _AttentionPool2d(
            input_resolution // 32, width * 32, heads, output_dim
        )

    def _make_layer(self, planes, blocks, stride=1):
        layers = [_Bottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * _Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.attnpool(x)


@pytest.fixture(scope="module")
def torch_visual():
    torch.manual_seed(0)
    m = _ModifiedResNet(
        layers=TINY_RN.vision_layers, output_dim=TINY_RN.embed_dim,
        heads=TINY_RN.vision_heads, input_resolution=TINY_RN.image_size,
        width=TINY_RN.vision_width,
    ).eval()
    # Non-trivial BN running stats: fresh buffers are (0, 1), which would
    # let a mean/var mix-up in the converter pass silently.
    gen = torch.Generator().manual_seed(1)
    for name, buf in m.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.2)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
    return m


@pytest.fixture(scope="module")
def visual_params(torch_visual):
    from evossearch_tpu.models.convert import _openai_resnet_visual

    sd = {f"visual.{k}": v for k, v in torch_visual.state_dict().items()}
    return _openai_resnet_visual(sd, TINY_RN)


def _rand_images(n=3):
    rng = np.random.default_rng(42)
    return rng.standard_normal(
        (n, TINY_RN.image_size, TINY_RN.image_size, 3)
    ).astype(np.float32)


def test_resnet_tower_matches_torch(torch_visual, visual_params):
    from evossearch_tpu.models.resnet import encode_image_resnet

    images = _rand_images()
    with torch.no_grad():
        t_emb = torch_visual(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
    t_emb = t_emb / np.linalg.norm(t_emb, axis=-1, keepdims=True)
    j_emb = np.asarray(
        encode_image_resnet({"visual": visual_params}, images, TINY_RN)
    )
    np.testing.assert_allclose(j_emb, t_emb, atol=2e-5, rtol=1e-4)


def test_encode_image_dispatches_on_family(visual_params):
    images = _rand_images(2)
    from evossearch_tpu.models.resnet import encode_image_resnet

    direct = np.asarray(
        encode_image_resnet({"visual": visual_params}, images, TINY_RN)
    )
    routed = np.asarray(
        encode_image({"visual": visual_params}, images, TINY_RN)
    )
    np.testing.assert_array_equal(direct, routed)
    with pytest.raises(ValueError, match="seq_merge"):
        encode_image({"visual": visual_params}, images, TINY_RN, seq_merge=2)


def test_bfloat16_compute_close_to_f32(visual_params):
    import jax.numpy as jnp

    images = _rand_images()
    f32 = np.asarray(encode_image({"visual": visual_params}, images, TINY_RN))
    bf16 = np.asarray(
        encode_image(
            {"visual": visual_params}, images, TINY_RN,
            compute_dtype=jnp.bfloat16,
        )
    )
    cos = (f32 * bf16).sum(-1)
    assert (cos > 0.995).all(), cos


def test_infer_resnet_spec_from_shapes(torch_visual):
    sd = {f"visual.{k}": v for k, v in torch_visual.state_dict().items()}
    # text keys needed only by the custom-spec fallback fields
    sd["token_embedding.weight"] = torch.zeros(TINY_RN.vocab_size, 48)
    sd["positional_embedding"] = torch.zeros(TINY_RN.context_length, 48)
    sd["ln_final.weight"] = torch.zeros(48)
    spec = infer_openai_resnet_spec(sd)
    assert spec.family == "resnet"
    assert spec.vision_layers == TINY_RN.vision_layers
    assert spec.vision_width == TINY_RN.vision_width
    assert spec.image_size == TINY_RN.image_size
    assert spec.embed_dim == TINY_RN.embed_dim


def test_release_specs_sane():
    for name in ("RN50", "RN101", "RN50x4", "RN50x16", "RN50x64"):
        spec = CLIP_MODEL_SPECS[name]
        assert spec.family == "resnet"
        # OpenAI build_model: heads = width * 32 // 64; pooled dim = 32w
        assert spec.vision_heads == spec.vision_width * 32 // 64
        assert spec.attn_dim % spec.vision_heads == 0
        assert spec.image_size % 32 == 0


def test_init_matches_analytic_count():
    import jax

    params = init_params(jax.random.key(0), TINY_RN)
    assert count_params(params) == expected_param_count(TINY_RN)


def test_rn50_init_count_and_forward():
    """Full RN50 init agrees with the analytic count and runs forward."""
    import jax

    spec = CLIP_MODEL_SPECS["RN50"]
    params = init_params(jax.random.key(0), spec)
    assert count_params(params) == expected_param_count(spec)
    img = np.zeros((1, spec.image_size, spec.image_size, 3), np.float32)
    emb = np.asarray(encode_image(params, img, spec))
    assert emb.shape == (1, spec.embed_dim)
    assert np.isfinite(emb).all()


def test_checkpoint_roundtrip(tmp_path, visual_params):
    import jax

    from evossearch_tpu.models.checkpoint import load_params, save_params

    params = init_params(jax.random.key(0), TINY_RN)
    params["visual"] = visual_params
    path = save_params(tmp_path / "rn", params, TINY_RN)
    loaded, spec = load_params(path)
    assert isinstance(spec, CLIPResNetSpec)
    assert spec == TINY_RN
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    images = _rand_images(2)
    np.testing.assert_allclose(
        np.asarray(encode_image(params, images, TINY_RN)),
        np.asarray(encode_image(loaded, images, TINY_RN)),
        atol=1e-6,
    )


def test_full_openai_resnet_state_dict_converts(torch_visual):
    """End-to-end from_openai_state_dict on a ResNet-layout checkpoint:
    family detection + text tower conversion + forward."""
    torch.manual_seed(3)
    sd = {f"visual.{k}": v for k, v in torch_visual.state_dict().items()}
    # 64-wide so the inferred fallback spec's width//64 head rule holds
    tw, tl = 64, TINY_RN.text_layers
    sd["token_embedding.weight"] = torch.randn(TINY_RN.vocab_size, tw) * 0.02
    sd["positional_embedding"] = torch.randn(TINY_RN.context_length, tw) * 0.01
    sd["ln_final.weight"] = torch.ones(tw)
    sd["ln_final.bias"] = torch.zeros(tw)
    sd["text_projection"] = torch.randn(tw, TINY_RN.embed_dim) * tw ** -0.5
    sd["logit_scale"] = torch.tensor(2.6593)
    for i in range(tl):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = torch.ones(tw)
        sd[f"{p}.ln_1.bias"] = torch.zeros(tw)
        sd[f"{p}.ln_2.weight"] = torch.ones(tw)
        sd[f"{p}.ln_2.bias"] = torch.zeros(tw)
        sd[f"{p}.attn.in_proj_weight"] = torch.randn(3 * tw, tw) * tw ** -0.5
        sd[f"{p}.attn.in_proj_bias"] = torch.zeros(3 * tw)
        sd[f"{p}.attn.out_proj.weight"] = torch.randn(tw, tw) * tw ** -0.5
        sd[f"{p}.attn.out_proj.bias"] = torch.zeros(tw)
        sd[f"{p}.mlp.c_fc.weight"] = torch.randn(4 * tw, tw) * tw ** -0.5
        sd[f"{p}.mlp.c_fc.bias"] = torch.zeros(4 * tw)
        sd[f"{p}.mlp.c_proj.weight"] = torch.randn(tw, 4 * tw) * tw ** -0.5
        sd[f"{p}.mlp.c_proj.bias"] = torch.zeros(tw)

    params, spec = from_openai_state_dict(sd)
    assert spec.family == "resnet"
    images = _rand_images(2)
    emb = np.asarray(encode_image(params, images, spec))
    assert emb.shape == (2, TINY_RN.embed_dim)

    from evossearch_tpu.models import encode_text

    toks = np.zeros((2, TINY_RN.context_length), np.int32)
    toks[:, 0] = 1
    toks[:, 1] = TINY_RN.vocab_size - 1
    txt = np.asarray(encode_text(params, toks, spec))
    assert txt.shape == (2, TINY_RN.embed_dim)


def test_engine_end_to_end_with_resnet(tmp_path, monkeypatch, visual_params):
    """Index + text search + image search through the real engine with a
    ResNet spec — the preprocess resize GEMMs, store, and search kernels
    are family-agnostic. Weights come from the torch oracle via a native
    checkpoint: the FAITHFUL random init zero-inits every bottleneck's
    bn3 gamma (residual-as-identity), which collapses untrained
    embeddings too much for a self-search assertion."""
    import jax
    from PIL import Image

    from evossearch_tpu.core import Config
    from evossearch_tpu.engine import SearchEngine
    from evossearch_tpu.models.checkpoint import save_params

    params = init_params(jax.random.key(0), TINY_RN)
    params["visual"] = visual_params
    ckpt = save_params(tmp_path / "tiny_rn", params, TINY_RN)

    monkeypatch.setenv("EVOSSEARCH_CHECKPOINT", str(ckpt))
    monkeypatch.delenv("EVOSSEARCH_BPE_VOCAB", raising=False)
    monkeypatch.setenv("EVOSSEARCH_COMPUTE_DTYPE", "float32")
    monkeypatch.setenv("EVOSSEARCH_BATCH_SIZE", "4")
    rng = np.random.default_rng(0)
    folder = tmp_path / "photos"
    folder.mkdir()
    for i in range(5):
        arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(folder / f"img_{i}.jpg", quality=90)

    eng = SearchEngine(
        cfg=Config(env_path=tmp_path / "missing.env"), spec=TINY_RN
    )
    try:
        count = eng.index_folder(str(folder))
        assert count == 5
        res = eng.search_text(str(folder), "a photo", k=3)
        assert res is not None
        scores, idx, reader = res
        assert len(scores) == 3
        assert (np.diff(scores) <= 1e-6).all()  # descending
        # image search: an indexed image finds itself first
        target = Image.open(folder / "img_2.jpg")
        s2, i2, r2 = eng.search_image(str(folder), target, k=3)
        assert r2.paths[int(i2[0])].endswith("img_2.jpg")
        assert s2[0] > 0.95
    finally:
        eng.close()


def test_deep_stage_parity_rn101_depth():
    """RN101's stage depths (3,4,23,3) at tiny width: the 23-block scanned
    tail must match a 23-deep torch Sequential — pins the per-stage
    param-stacking order at real release depths."""
    from evossearch_tpu.models.convert import _openai_resnet_visual
    from evossearch_tpu.models.resnet import encode_image_resnet

    deep = CLIPResNetSpec(
        name="tiny-rn101", image_size=64,
        vision_width=16, vision_layers=(3, 4, 23, 3), vision_heads=8,
        text_width=48, text_layers=2, text_heads=4,
        vocab_size=512, context_length=16, embed_dim=32,
    )
    torch.manual_seed(11)
    m = _ModifiedResNet(
        layers=deep.vision_layers, output_dim=deep.embed_dim,
        heads=deep.vision_heads, input_resolution=deep.image_size,
        width=deep.vision_width,
    ).eval()
    gen = torch.Generator().manual_seed(12)
    for name, buf in m.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.2)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
    sd = {f"visual.{k}": v for k, v in m.state_dict().items()}
    params = {"visual": _openai_resnet_visual(sd, deep)}
    rng = np.random.default_rng(13)
    images = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_emb = m(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    t_emb = t_emb / np.linalg.norm(t_emb, axis=-1, keepdims=True)
    j_emb = np.asarray(encode_image_resnet(params, images, deep))
    np.testing.assert_allclose(j_emb, t_emb, atol=5e-5, rtol=1e-4)


def test_train_step_rejects_resnet():
    from evossearch_tpu.train.contrastive import make_optimizer, make_train_step

    with pytest.raises(NotImplementedError, match="ViT"):
        make_train_step(TINY_RN, make_optimizer())
