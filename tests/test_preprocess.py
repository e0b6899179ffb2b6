"""Preprocess parity: device fused resample/crop/normalize vs the PIL
reference path (the transform the reference app applies at oldapp.py:32/40).

PIL's uint8 resampling uses 8-bit fixed-point coefficients; our device path
is float32, so agreement is to ~1-2 quantization steps per pixel, which is
far below what shifts a CLIP embedding (also asserted end-to-end here).
"""

import numpy as np
import pytest
from PIL import Image

from evossearch_tpu.preprocess import (
    preprocess_batch,
    preprocess_reference,
    resample_matrix,
    resized_dims,
)


def _random_image(rng, h, w):
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB")


def test_resized_dims():
    assert resized_dims(480, 640, 224) == (224, 298)  # int(224*640/480)=298
    assert resized_dims(640, 480, 224) == (298, 224)
    assert resized_dims(224, 224, 224) == (224, 224)
    assert resized_dims(100, 300, 224) == (224, 672)  # upscale shorter side


def test_resample_matrix_rows_sum_to_one():
    for in_size, out_size in [(480, 224), (224, 224), (100, 224), (37, 224)]:
        m = resample_matrix(in_size, out_size)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_resample_matches_pil_float_path_exactly():
    """PIL mode-'F' resize has no fixed-point quantization: our weight
    matrices must reproduce it to float tolerance — the exactness anchor."""
    rng = np.random.default_rng(0)
    arr = (rng.random((480, 640)) * 255).astype(np.float32)
    pil_out = np.asarray(
        Image.fromarray(arr, "F").resize((298, 224), Image.Resampling.BICUBIC),
        dtype=np.float64,
    )
    ours = (
        resample_matrix(480, 224).astype(np.float64)
        @ arr.astype(np.float64)
        @ resample_matrix(640, 298).astype(np.float64).T
    )
    assert np.abs(ours - pil_out).max() < 1e-4


def test_resample_matches_pil_uint8_within_quantization():
    rng = np.random.default_rng(0)
    img = _random_image(rng, 480, 640)
    rh, rw = resized_dims(480, 640, 224)
    pil_out = np.asarray(
        img.resize((rw, rh), Image.Resampling.BICUBIC), dtype=np.float32
    )
    a_h = resample_matrix(480, rh)
    a_w = resample_matrix(640, rw)
    ours = np.einsum("hH,HWc->hWc", a_h, np.asarray(img, dtype=np.float32))
    ours = np.einsum("wW,hWc->hwc", a_w, ours)
    # PIL's uint8 path quantizes to fixed-point after each pass; on noise
    # images the worst pixel lands a few steps off. The float-path test
    # above pins algorithmic exactness.
    diff = np.abs(ours - pil_out)
    assert diff.max() <= 6.0, diff.max()
    assert diff.mean() < 0.6


@pytest.mark.parametrize("size", [(480, 640), (640, 480), (224, 224), (120, 90), (500, 500)])
def test_device_pipeline_matches_reference(size):
    rng = np.random.default_rng(1)
    img = _random_image(rng, *size)
    ref = preprocess_reference(img)
    dev = np.asarray(preprocess_batch([img], max_side=704))[0]
    assert dev.shape == ref.shape == (224, 224, 3)
    # tolerance: PIL fixed-point quantization (up to ~6 uint8 steps on noise
    # images), scaled by 1/(255*std); mean must be far tighter
    diff = np.abs(dev - ref)
    assert diff.max() < 6.5 / (255 * 0.26), diff.max()
    assert diff.mean() < 0.01


@pytest.mark.parametrize("size", [(480, 640), (336, 336), (200, 420)])
def test_device_pipeline_matches_reference_at_336(size):
    """ViT-L/14@336px preprocesses at target 336 through the same
    resample-as-GEMM stage; parity must hold there too."""
    rng = np.random.default_rng(3)
    img = _random_image(rng, *size)
    ref = preprocess_reference(img, target=336)
    dev = np.asarray(preprocess_batch([img], target=336, max_side=704))[0]
    assert dev.shape == ref.shape == (336, 336, 3)
    diff = np.abs(dev - ref)
    assert diff.max() < 6.5 / (255 * 0.26), diff.max()
    assert diff.mean() < 0.01


def test_oversized_image_host_shrink_path():
    rng = np.random.default_rng(2)
    img = _random_image(rng, 1200, 1600)  # > max_side -> host pre-shrink
    ref = preprocess_reference(img)
    dev = np.asarray(preprocess_batch([img], max_side=1024))[0]
    # two-stage resample differs slightly from single-stage; embeddings-level
    # equivalence is what matters, pixel tolerance is looser here
    assert np.abs(dev - ref).mean() < 0.05
    assert np.abs(dev - ref).max() < 0.6


def test_panorama_takes_exact_windowed_path():
    """A long side beyond the canvas ladder must NOT force the pre-shrink
    when the crop-support window fits: only a centered short-side-wide
    band of the long axis is ever read, so a 300x4000 panorama rides the
    normal windowed path with reference-exact geometry. (Before the
    round-5 fix, canvas-fit routing shrank 500x8000 to 64x1024 — the
    embedding came from a 64-px-tall blur.)"""
    rng = np.random.default_rng(7)
    for size in ((300, 4000), (4000, 300), (100, 3000)):
        img = _random_image(rng, *size)
        ref = preprocess_reference(img)
        dev = np.asarray(preprocess_batch([img], max_side=1024))[0]
        diff = np.abs(dev - ref)
        # exact windowed math: same tight tolerance as in-ladder images
        assert diff.mean() < 0.01, (size, diff.mean())
        assert diff.max() < 6.5 / (255 * 0.26), (size, diff.max())


def test_huge_short_side_keeps_target_resolution():
    """When the pre-shrink IS needed (short side beyond the ladder), the
    long axis must not drive the short side below the 4*target floor."""
    from evossearch_tpu.preprocess.pipeline import _host_shrink

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (2000, 9000, 3), dtype=np.uint8)
    out = _host_shrink(arr, 1024, 224)
    assert min(out.shape[:2]) == 4 * 224, out.shape  # floor, not 1024/9000


def test_non_rgb_modes_converted():
    rng = np.random.default_rng(3)
    gray = Image.fromarray(rng.integers(0, 256, (300, 400), dtype=np.uint8), "L")
    rgba = Image.fromarray(
        rng.integers(0, 256, (300, 400, 4), dtype=np.uint8), "RGBA"
    )
    out = np.asarray(preprocess_batch([gray, rgba], max_side=512))
    assert out.shape == (2, 224, 224, 3)
    assert np.isfinite(out).all()


def test_preprocess_shifts_embeddings_negligibly():
    """End-to-end: device-vs-reference preprocess difference must not move a
    CLIP embedding (tiny random tower) beyond float noise."""
    import jax

    from evossearch_tpu.core.constants import CLIPModelSpec
    from evossearch_tpu.models import encode_image, init_params

    spec = CLIPModelSpec(
        name="t", image_size=224, patch_size=32, vision_width=64,
        vision_layers=2, vision_heads=4, text_width=32, text_layers=1,
        text_heads=2, vocab_size=128, context_length=8, embed_dim=16,
    )
    params = init_params(jax.random.key(0), spec)
    rng = np.random.default_rng(4)
    img = _random_image(rng, 480, 640)
    e_ref = np.asarray(
        encode_image(params, preprocess_reference(img)[None], spec)
    )
    e_dev = np.asarray(
        encode_image(params, np.asarray(preprocess_batch([img], max_side=704)), spec)
    )
    cos = float((e_ref * e_dev).sum())
    assert cos > 0.9999, cos
