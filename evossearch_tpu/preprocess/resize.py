"""PIL-faithful antialiased bicubic resampling as dense weight matrices.

The reference preprocess (CLIP's `_transform`, invoked at oldapp.py:32/40)
is: PIL bicubic resize of the shorter side to 224, then center-crop 224.
Both steps are linear maps along each image axis, so the whole thing is
``out = A_h @ img @ A_w.T`` with per-axis weight matrices — which turns the
preprocess into two GEMMs that run on the TPU MXU with static shapes
regardless of the source image size (weights are computed host-side per
source size, zero-padded to a static maximum).

Weight construction reproduces Pillow's Resample.c "precompute_coeffs":
cubic kernel a=-0.5 with support 2, kernel stretched by the scale factor
when downscaling (antialias), per-output-pixel normalization. The center
crop is folded in by shifting sample centers by the crop offset, so only
224 output rows/cols are ever computed.
"""

from __future__ import annotations

import functools
import math

import numpy as np

_BICUBIC_A = -0.5
_SUPPORT = 2.0


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    a = _BICUBIC_A
    return np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


def resized_dims(height: int, width: int, target: int) -> tuple[int, int]:
    """Shorter-side resize dims, matching torchvision's int truncation."""
    if height <= width:
        return target, max(target, int(target * width / height))
    return max(target, int(target * height / width)), target


def crop_offset(resized: int, crop: int) -> float:
    """Center-crop start offset along one axis (torchvision rounding)."""
    return float(int(round((resized - crop) / 2.0)))


@functools.lru_cache(maxsize=4096)
def resample_matrix(
    in_size: int, out_size: int, crop_start: float = 0.0, crop_size: int | None = None
) -> np.ndarray:
    """(crop_size, in_size) float32 weights for resize-then-crop on one axis.

    Row r holds the bicubic weights producing output pixel ``crop_start + r``
    of an ``in_size -> out_size`` PIL bicubic resize; taking only crop_size
    rows implements the center crop for free.
    """
    crop_size = out_size if crop_size is None else crop_size
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = _SUPPORT * filterscale
    weights = np.zeros((crop_size, in_size), dtype=np.float64)
    for r in range(crop_size):
        center = (crop_start + r + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = _cubic_kernel((xs + 0.5 - center) / filterscale)
        total = w.sum()
        if total != 0.0:
            w /= total
        weights[r, xmin:xmax] = w
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=4096)
def chroma_resample_matrix(
    full_in: int,
    chroma_in: int,
    out_size: int,
    crop_start: float = 0.0,
    crop_size: int | None = None,
) -> np.ndarray:
    """(crop_size, chroma_in) weights resampling a half-resolution 4:2:0
    chroma plane straight to the full-resolution resize+crop output grid.

    The planar JPEG path (native decode_jpeg_planar) ships chroma at half
    the luma resolution; instead of upsampling it first (which would cost
    the very host->device bytes the planar path saves), the upsample is
    folded into the resize GEMM. Chroma sample ``i`` sits at full-res
    coordinate ``2*(i + 0.5)`` (centered 4:2:0 siting), so output pixel
    ``crop_start + r`` of the luma resize — full-res position
    ``(crop_start + r + 0.5) * scale`` — lands at chroma-grid position
    ``.../2``, with the antialias filter stretched by ``scale/2`` (chroma
    upsamples whenever the luma resize downsamples by less than 2x).
    """
    crop_size = out_size if crop_size is None else crop_size
    scale = full_in / out_size / 2.0
    filterscale = max(scale, 1.0)
    support = _SUPPORT * filterscale
    weights = np.zeros((crop_size, chroma_in), dtype=np.float64)
    for r in range(crop_size):
        center = (crop_start + r + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(chroma_in, int(center + support + 0.5))
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = _cubic_kernel((xs + 0.5 - center) / filterscale)
        total = w.sum()
        if total != 0.0:
            w /= total
        weights[r, xmin:xmax] = w
    return weights.astype(np.float32)


def clip_resize_crop_chroma_matrices(
    height: int, width: int, ch: int, cw: int, target: int = 224
) -> tuple[np.ndarray, np.ndarray]:
    """Chroma counterparts of clip_resize_crop_matrices: (target, ch) and
    (target, cw) matrices mapping the half-res chroma planes of an
    (height, width) image onto the SAME resize+crop output grid as the
    luma matrices, so ``A_hc @ chroma @ A_wc.T`` aligns pixel-for-pixel
    with ``A_h @ luma @ A_w.T``."""
    rh, rw = resized_dims(height, width, target)
    a_hc = chroma_resample_matrix(height, ch, rh, crop_offset(rh, target), target)
    a_wc = chroma_resample_matrix(width, cw, rw, crop_offset(rw, target), target)
    return a_hc, a_wc


def clip_resize_crop_matrices(
    height: int, width: int, target: int = 224
) -> tuple[np.ndarray, np.ndarray]:
    """Per-axis weight matrices for the full CLIP resize+center-crop.

    Returns (A_h of shape (target, height), A_w of shape (target, width))
    such that ``A_h @ img @ A_w.T`` equals bicubic-resize-shorter-side-to-
    target followed by center-crop(target).
    """
    rh, rw = resized_dims(height, width, target)
    a_h = resample_matrix(height, rh, crop_offset(rh, target), target)
    a_w = resample_matrix(width, rw, crop_offset(rw, target), target)
    return a_h, a_w


def resample_reference(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-numpy oracle: full resize of an (H, W, C) float image."""
    a_h = resample_matrix(img.shape[0], out_h)
    a_w = resample_matrix(img.shape[1], out_w)
    return np.einsum("hH,HWc,wW->hwc", a_h, img.astype(np.float64), a_w)
