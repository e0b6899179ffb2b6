"""Batched image preprocessing pipeline: host decode -> device fused
resize + center-crop + normalize.

Replaces the reference's per-image host PIL path (`preprocess(Image.open(p))`
at oldapp.py:32, batch size 1) with a batched, static-shape device stage:

  host:   decode (PIL) -> RGB uint8, pad into a (MAX, MAX, 3) canvas,
          fetch cached per-size resize/crop weight matrices
  device: one jitted kernel: two resampling GEMMs + /255 + CLIP mean/std
          normalize, over the whole batch

Static shapes are what make this jittable for arbitrary image sizes: the
weight matrices are zero-padded to (224, MAX); padded canvas pixels get zero
weight so they never influence the output. Images larger than MAX on a side
are pre-shrunk host-side with the SAME resampling algorithm (numpy), which
composes near-identically for the sizes involved.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..core.constants import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
from .resize import clip_resize_crop_matrices, resample_matrix, resized_dims

DEFAULT_MAX_SIDE = 1024


@dataclass
class HostPrepared:
    """One image, host-prepared for the device kernel."""

    canvas: np.ndarray  # (max_side, max_side, 3) uint8
    a_h: np.ndarray  # (target, max_side) float32
    a_w: np.ndarray  # (target, max_side) float32


@functools.lru_cache(maxsize=4096)
def _padded_matrices(
    height: int, width: int, target: int, max_side: int
) -> tuple[np.ndarray, np.ndarray]:
    a_h, a_w = clip_resize_crop_matrices(height, width, target)
    ph = np.zeros((target, max_side), dtype=np.float32)
    pw = np.zeros((target, max_side), dtype=np.float32)
    ph[:, :height] = a_h
    pw[:, :width] = a_w
    return ph, pw


def _host_shrink(arr: np.ndarray, max_side: int, target: int) -> np.ndarray:
    """Pre-shrink an oversized image with the same bicubic algorithm.

    Scale must (a) fit both sides in the canvas, (b) never upscale, and is
    (c) allowed to shrink down to shorter-side = 4*target for speed. PIL's
    uint8 pass order/quantization is mirrored (horizontal, round+clamp,
    vertical, round+clamp) for consistency with the device kernel.
    """
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(h, w), 4 * target / min(h, w))
    nh = min(max_side, max(1, int(h * scale)))
    nw = min(max_side, max(1, int(w * scale)))
    a_h = resample_matrix(h, nh)
    a_w = resample_matrix(w, nw)
    out = np.einsum("sw,hwc->hsc", a_w, arr.astype(np.float32))
    out = np.clip(np.round(out), 0, 255)
    out = np.einsum("th,hsc->tsc", a_h, out)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def prepare_host(
    image, target: int = 224, max_side: int = DEFAULT_MAX_SIDE
) -> HostPrepared:
    """PIL image (any mode/size) or (H, W, 3) uint8 array -> HostPrepared."""
    if isinstance(image, np.ndarray):
        arr = image
    else:
        if image.mode != "RGB":
            image = image.convert("RGB")
        arr = np.asarray(image, dtype=np.uint8)
    if arr.shape[0] > max_side or arr.shape[1] > max_side:
        arr = _host_shrink(arr, max_side, target)
    h, w = arr.shape[:2]
    canvas = np.zeros((max_side, max_side, 3), dtype=np.uint8)
    canvas[:h, :w] = arr
    a_h, a_w = _padded_matrices(h, w, target, max_side)
    return HostPrepared(canvas=canvas, a_h=a_h, a_w=a_w)


def device_preprocess(canvases, a_h, a_w, out_dtype=None):
    """Jittable fused resample + crop + normalize.

    canvases: (B, MAX, MAX, 3) uint8;  a_h/a_w: (B, target, MAX) float32.
    Returns (B, target, target, 3) in ``out_dtype`` (default float32),
    normalized with the CLIP mean/std.

    Pass order and quantization mirror PIL's uint8 resampling pipeline
    (horizontal pass, round+clamp to [0,255], vertical pass, round+clamp):
    bicubic kernels overshoot, and PIL's inter-pass clamping is visible in
    the output, so skipping it would diverge from the reference transform.
    """
    import jax.numpy as jnp

    x = canvases.astype(jnp.float32)
    # Horizontal (width) resample first, like PIL — two MXU GEMMs per image.
    x = jnp.einsum("bsw,bhwc->bhsc", a_w, x, preferred_element_type=jnp.float32)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = jnp.einsum("bth,bhsc->btsc", a_h, x, preferred_element_type=jnp.float32)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=jnp.float32) * 255.0
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=jnp.float32) * 255.0
    x = (x - mean) / std
    if out_dtype is not None:
        x = x.astype(out_dtype)
    return x


def device_preprocess_indexed(canvases, a_h_unique, a_w_unique, size_idx,
                              out_dtype=None):
    """device_preprocess with per-UNIQUE-size weight matrices.

    Real folders hold a handful of image sizes, so shipping one (target,
    Hp)/(target, Wp) matrix pair per unique size plus a (B,) index — and
    gathering on device — cuts host->device traffic by ~the batch size
    (the matrices outweigh the uint8 canvas ~1.5x when sent per image).
    """
    return device_preprocess(
        canvases, a_h_unique[size_idx], a_w_unique[size_idx], out_dtype
    )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def prepare_batch(
    arrays: list[np.ndarray],
    target: int = 224,
    pad_multiple: int = 256,
    max_side: int = DEFAULT_MAX_SIDE,
):
    """Batch of (H, W, 3) uint8 arrays -> device-ready tensors.

    Returns (canvases (B, Hp, Wp, 3) uint8, a_h_unique (U, target, Hp) f32,
    a_w_unique (U, target, Wp) f32, size_idx (B,) int32).

    Every shape the downstream jit sees is drawn from a SMALL ladder so
    heterogeneous folders can't trigger a recompile per batch: canvas dims
    round up to ``pad_multiple`` (<= max_side/256 = 4 values per axis) and
    the unique-size count U pads to a power of two (repeating row 0). A
    homogeneous batch still ships one matrix pair and a near-tight canvas.
    """
    shrunk = [
        _host_shrink(a, max_side, target)
        if a.shape[0] > max_side or a.shape[1] > max_side else a
        for a in arrays
    ]
    hp = -(-max(a.shape[0] for a in shrunk) // pad_multiple) * pad_multiple
    wp = -(-max(a.shape[1] for a in shrunk) // pad_multiple) * pad_multiple
    canvases = np.zeros((len(shrunk), hp, wp, 3), np.uint8)
    sizes: dict[tuple[int, int], int] = {}
    size_idx = np.zeros(len(shrunk), np.int32)
    for i, a in enumerate(shrunk):
        h, w = a.shape[:2]
        canvases[i, :h, :w] = a
        size_idx[i] = sizes.setdefault((h, w), len(sizes))
    u_pad = _next_pow2(len(sizes))
    a_h = np.zeros((u_pad, target, hp), np.float32)
    a_w = np.zeros((u_pad, target, wp), np.float32)
    for (h, w), u in sizes.items():
        mh, mw = clip_resize_crop_matrices(h, w, target)
        a_h[u, :, :h] = mh
        a_w[u, :, :w] = mw
    for u in range(len(sizes), u_pad):  # pad rows: duplicate row 0
        a_h[u] = a_h[0]
        a_w[u] = a_w[0]
    return canvases, a_h, a_w, size_idx


@functools.lru_cache(maxsize=8)
def _jitted_device_preprocess(out_dtype):
    import jax

    return jax.jit(functools.partial(device_preprocess, out_dtype=out_dtype))


def preprocess_batch(
    images, target: int = 224, max_side: int = DEFAULT_MAX_SIDE, out_dtype=None
):
    """List of PIL images -> (B, target, target, 3) preprocessed device array."""
    import jax.numpy as jnp

    prepped = [prepare_host(im, target, max_side) for im in images]
    canvases = jnp.asarray(np.stack([p.canvas for p in prepped]))
    a_h = jnp.asarray(np.stack([p.a_h for p in prepped]))
    a_w = jnp.asarray(np.stack([p.a_w for p in prepped]))
    return _jitted_device_preprocess(out_dtype)(canvases, a_h, a_w)


def preprocess_reference(image, target: int = 224) -> np.ndarray:
    """Pure-host oracle path via PIL resize (reference-equivalent transform).

    Mirrors CLIP's torchvision pipeline: PIL bicubic shorter-side resize,
    center crop, scale to [0,1], normalize. Used for parity tests and as a
    fallback for images PIL decodes but the device path cannot express.
    """
    from PIL import Image

    if image.mode != "RGB":
        image = image.convert("RGB")
    rh, rw = resized_dims(image.height, image.width, target)
    resized = image.resize((rw, rh), Image.Resampling.BICUBIC)
    top = int(round((rh - target) / 2.0))
    left = int(round((rw - target) / 2.0))
    cropped = resized.crop((left, top, left + target, top + target))
    arr = np.asarray(cropped, dtype=np.float32) / 255.0
    mean = np.asarray(CLIP_IMAGE_MEAN, dtype=np.float32)
    std = np.asarray(CLIP_IMAGE_STD, dtype=np.float32)
    return (arr - mean) / std
