"""Thumbnail service (component H): base64 JPEG inline in JSON responses.

Same output contract as the reference (oldapp.py:2014-2020: PIL thumbnail
(400,400) LANCZOS -> JPEG quality 85 -> base64), deduplicated into one
helper instead of three copies. One deliberate fix: non-RGB images (RGBA
PNG, palette GIF-style PNGs) are converted before JPEG encode — the
reference raises inside PIL and silently drops those results.
"""

from __future__ import annotations

import base64
from io import BytesIO

from PIL import Image


def thumbnail_b64(
    image_path: str, size: tuple[int, int] = (400, 400), quality: int = 85
) -> str:
    img = Image.open(image_path)
    img.thumbnail(size, Image.Resampling.LANCZOS)
    if img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    buffer = BytesIO()
    img.save(buffer, format="JPEG", quality=quality)
    return base64.b64encode(buffer.getvalue()).decode()
