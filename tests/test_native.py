"""Native C++ runtime components: exact scanner and JPEG decoder
(first-party replacements for the reference's FAISS/PIL native layers).
Skipped wholesale if the toolchain can't build the extension."""

import io

import numpy as np
import pytest
from PIL import Image

from evossearch_tpu.preprocess.io import get_native, load_image_rgb

native = get_native()
pytestmark = pytest.mark.skipif(native is None, reason="native ext unavailable")


def _jpeg(arr, quality=92):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_topk_matches_oracle_with_ties():
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((5000, 64)).astype(np.float32)
    emb[100] = emb[200] = emb[4000]  # exact duplicates -> score ties
    q = emb[4000].copy()
    s, i = native.topk(emb.tobytes(), 5000, 64, q.tobytes(), 10)
    scores = emb @ q
    oracle = np.lexsort((np.arange(5000), -scores))[:10]
    assert list(i) == oracle.tolist()
    assert list(i)[:3] == [100, 200, 4000]  # lowest index first on ties
    np.testing.assert_allclose(s, scores[oracle], rtol=1e-5)


def test_exact_search_host_wrapper():
    from evossearch_tpu.index.search import exact_search_host

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((1000, 32)).astype(np.float32)
    q = rng.standard_normal(32).astype(np.float32)
    s, i = exact_search_host(emb, q, 48)
    scores = emb @ q
    oracle = np.lexsort((np.arange(1000), -scores))[:48]
    np.testing.assert_array_equal(i, oracle)


def test_decode_jpeg_full_matches_pil_closely():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    data = _jpeg(arr)
    h, w, rgb = native.decode_jpeg(data)
    ours = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == pil.shape
    # both decode the same bitstream; IDCT rounding may differ by ~1
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2


def test_decode_jpeg_dct_scaling():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (1600, 2400, 3), dtype=np.uint8)
    h, w, _ = native.decode_jpeg(_jpeg(arr), 224)
    assert min(h, w) >= 224
    assert min(h, w) < 1600  # actually scaled down


def test_decode_jpeg_batch_skips_corrupt():
    rng = np.random.default_rng(4)
    good = _jpeg(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    out = native.decode_jpeg_batch([good, b"garbage", good], 0, 2)
    assert out[0] is not None and out[2] is not None and out[1] is None


def test_load_image_rgb_fast_path(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (900, 1200, 3), dtype=np.uint8)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, quality=92)
    fast = load_image_rgb(p, min_short_side=448, fast=True)
    full = load_image_rgb(p, fast=False)
    assert full.shape == (900, 1200, 3)
    assert fast.shape[0] < 900 and min(fast.shape[:2]) >= 448


def test_fast_decode_embedding_cosine():
    """DCT-scaled decode must not move CLIP embeddings (cosine ~ 1)."""
    import jax

    from evossearch_tpu.core.constants import CLIPModelSpec
    from evossearch_tpu.models import encode_image, init_params
    from evossearch_tpu.preprocess import preprocess_batch

    spec = CLIPModelSpec(
        name="t", image_size=224, patch_size=32, vision_width=64,
        vision_layers=2, vision_heads=4, text_width=32, text_layers=1,
        text_heads=2, vocab_size=128, context_length=8, embed_dim=16,
    )
    params = init_params(jax.random.key(0), spec)
    rng = np.random.default_rng(6)
    # photo-like smooth image (noise images overstate DCT-scale error)
    base = np.zeros((1200, 1600, 3), np.float32)
    base[:, :, 0] = np.linspace(30, 220, 1600)[None, :]
    base[:, :, 1] = np.linspace(60, 180, 1200)[:, None]
    base[:, :, 2] = 120
    base += rng.normal(0, 6, base.shape)
    data = _jpeg(base.clip(0, 255).astype(np.uint8))
    h, w, rgb = native.decode_jpeg(data, 448)
    fast_arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    full_arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    e_fast = np.asarray(
        encode_image(params, np.asarray(preprocess_batch([fast_arr], max_side=1024)), spec)
    )
    e_full = np.asarray(
        encode_image(params, np.asarray(preprocess_batch([full_arr], max_side=1600)), spec)
    )
    cos = float((e_fast * e_full).sum())
    assert cos > 0.999, cos


def test_topk_bf16_streams_raw_shards():
    """topk_bf16 scans the bf16 bit pattern directly and must match the
    f32 scan of the widened values bit-for-bit (same ties contract)."""
    import ml_dtypes

    rng = np.random.default_rng(5)
    emb16 = rng.standard_normal((4000, 64)).astype(ml_dtypes.bfloat16)
    q = rng.standard_normal(64).astype(np.float32)
    s16, i16 = native.topk_bf16(
        np.ascontiguousarray(emb16).view(np.uint16).data, 4000, 64,
        np.ascontiguousarray(q).data, 10,
    )
    emb32 = np.ascontiguousarray(emb16.astype(np.float32))
    s32, i32 = native.topk(emb32.data, 4000, 64, np.ascontiguousarray(q).data, 10)
    np.testing.assert_array_equal(np.asarray(i16), np.asarray(i32))
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), rtol=1e-6)


def test_exact_search_host_bf16_matches_device_contract():
    """exact_search_host on a bf16 corpus quantizes the query like the
    device kernels and agrees with the f32 oracle over widened values."""
    import ml_dtypes

    from evossearch_tpu.index.search import exact_search_host

    rng = np.random.default_rng(6)
    emb16 = rng.standard_normal((3000, 32)).astype(ml_dtypes.bfloat16)
    q = rng.standard_normal(32).astype(np.float32)
    s, i = exact_search_host(emb16, q, 12)
    q16 = q.astype(ml_dtypes.bfloat16).astype(np.float32)
    ref = emb16.astype(np.float32) @ q16
    order = np.lexsort((np.arange(3000), -ref))[:12]
    np.testing.assert_array_equal(i, order)
    np.testing.assert_allclose(s, ref[order], rtol=1e-6)
