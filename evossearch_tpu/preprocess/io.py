"""Image loading for the indexing pipeline.

JPEGs (the dominant format in photo folders) go through the first-party
C++ libjpeg decoder (native/evossearch_native.cpp) when built: DCT-scaled
decode at the cheapest 1/8..8/8 scale whose short side still covers
``min_short_side``, which makes decoding large photos up to ~8x cheaper —
this is the input-pipeline bottleneck for the >=1k images/sec target
(SURVEY.md §7 hard part 3). Everything else (PNG/BMP/WEBP, odd JPEGs, or
when the extension isn't built) falls back to PIL, the reference's decoder
(oldapp.py:32).

The native extension is built on demand (one g++ invocation, cached as
evossearch_tpu/_native.so); failures degrade silently to PIL.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

import numpy as np

_native = None
_native_checked = False


def get_native():
    """The _native extension module, building it on first use; None if
    unavailable (no compiler / no libjpeg headers)."""
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    stale = False
    try:
        from evossearch_tpu import _native as mod

        # a .so built before the planar API is stale — rebuild in place
        if hasattr(mod, "decode_jpeg_planar_batch"):
            _native = mod
            return _native
        stale = True
    except ImportError:
        pass
    build = Path(__file__).resolve().parents[2] / "native" / "build.sh"
    if build.exists() and os.environ.get("EVOSSEARCH_NO_NATIVE_BUILD") != "1":
        try:
            subprocess.run(
                ["sh", str(build)], capture_output=True, timeout=120, check=True
            )
            if stale:
                from evossearch_tpu import _native as mod

                _native = _load_rebuilt_so(mod)
            else:
                from evossearch_tpu import _native as mod

                _native = mod
        except Exception:
            _native = None
    elif stale:
        # can't rebuild: keep the old module — callers feature-gate on
        # hasattr, so the pre-planar API still works
        from evossearch_tpu import _native as mod

        _native = mod
    return _native


def _load_rebuilt_so(old_mod):
    """The just-rebuilt extension binary, or ``old_mod`` if loading fails.

    ``importlib.reload`` is a no-op for single-phase-init C extensions:
    it hands back the same module object without touching the new .so —
    and CPython's extension-module cache is keyed by (name, path), so
    re-importing under the same name cannot pick it up either. Loading
    the same ``PyInit__native`` entry point under a DIFFERENT module
    name defeats that cache; the rebuild replaced the file, so dlopen
    sees a new inode and maps the new code. Without this, a process that
    started with a pre-planar .so kept the RGB fallback (2x the canvas
    upload bytes) for its whole lifetime despite the rebuild.
    """
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "evossearch_tpu_rebuilt._native", Path(old_mod.__file__)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        if hasattr(mod, "decode_jpeg_planar_batch"):
            return mod
    except Exception:
        pass
    return old_mod


def load_batch_planar(
    paths: list, min_short_side: int = 0, fast: bool = True
) -> list:
    """Decode a batch preferring planar 4:2:0 output for JPEGs.

    Entry types in the returned list (same order as ``paths``):
      (y, cb, cr) tuple of uint8 arrays — planar YCbCr from the native
          decoder (y: (H, W); cb/cr: (ceil(H/2), ceil(W/2))), 1.5 B/px
          for the device upload instead of RGB's 3;
      (H, W, 3) uint8 ndarray — RGB for non-JPEGs, non-YCbCr JPEGs, or
          when the native extension is unavailable;
      None — per-image decode failure (caller skips; oldapp.py:79-80).
    """
    native = get_native()
    if native is None or not hasattr(native, "decode_jpeg_planar_batch"):
        return load_batch_rgb(paths, min_short_side, fast)
    out: list = [None] * len(paths)
    jpeg_positions = []
    jpeg_bytes = []
    for pos, path in enumerate(paths):
        path = Path(path)
        if fast and path.suffix.lower() in (".jpg", ".jpeg"):
            try:
                jpeg_bytes.append(path.read_bytes())
                jpeg_positions.append(pos)
                continue
            except OSError:
                out[pos] = None
                continue
        try:
            out[pos] = load_image_rgb(path, min_short_side, fast)
        except Exception:
            out[pos] = None
    if jpeg_positions:
        decoded = native.decode_jpeg_planar_batch(jpeg_bytes, min_short_side, 0)
        for pos, result in zip(jpeg_positions, decoded):
            if result is None:
                # odd JPEG the native decoder rejects -> PIL retry
                try:
                    out[pos] = load_image_rgb(paths[pos], 0, fast=False)
                except Exception:
                    out[pos] = None
            elif len(result) == 3:  # non-YCbCr source -> RGB fallback shape
                h, w, rgb = result
                out[pos] = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
            else:
                h, w, ch, cw, y, cb, cr = result
                out[pos] = (
                    np.frombuffer(y, np.uint8).reshape(h, w),
                    np.frombuffer(cb, np.uint8).reshape(ch, cw),
                    np.frombuffer(cr, np.uint8).reshape(ch, cw),
                )
    return out


def load_batch_rgb(
    paths: list, min_short_side: int = 0, fast: bool = True
) -> list[np.ndarray | None]:
    """Decode a batch of files; None entries mark per-image failures
    (caller skips them — reference oldapp.py:79-80 semantics).

    JPEGs go through the native threaded batch decoder (GIL released, one
    worker per core); everything else through load_image_rgb.
    """
    native = get_native()
    out: list[np.ndarray | None] = [None] * len(paths)
    jpeg_positions = []
    jpeg_bytes = []
    for pos, path in enumerate(paths):
        path = Path(path)
        if fast and native is not None and path.suffix.lower() in (".jpg", ".jpeg"):
            try:
                jpeg_bytes.append(path.read_bytes())
                jpeg_positions.append(pos)
                continue
            except OSError:
                out[pos] = None
                continue
        try:
            out[pos] = load_image_rgb(path, min_short_side, fast)
        except Exception:
            out[pos] = None
    if jpeg_positions:
        decoded = native.decode_jpeg_batch(jpeg_bytes, min_short_side, 0)
        for pos, result in zip(jpeg_positions, decoded):
            if result is None:
                # odd JPEG the native decoder rejects -> PIL retry
                try:
                    out[pos] = load_image_rgb(paths[pos], 0, fast=False)
                except Exception:
                    out[pos] = None
            else:
                h, w, rgb = result
                out[pos] = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    return out


def load_image_rgb(
    path: str | os.PathLike, min_short_side: int = 0, fast: bool = True
) -> np.ndarray:
    """Decode to an (H, W, 3) uint8 RGB array.

    ``min_short_side`` > 0 allows DCT-scaled JPEG decode (native path only);
    0 forces full-resolution decode everywhere (bit-parity with PIL).
    Raises on undecodable files — the builder's per-image error-skip
    handles that (reference semantics, oldapp.py:79-80).
    """
    path = Path(path)
    if fast and path.suffix.lower() in (".jpg", ".jpeg"):
        native = get_native()
        if native is not None:
            try:
                h, w, rgb = native.decode_jpeg(path.read_bytes(), min_short_side)
                return np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
            except ValueError:
                pass  # odd JPEG -> PIL fallback
    from PIL import Image

    img = Image.open(path)
    img.load()
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)
