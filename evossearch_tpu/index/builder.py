"""Batched, resumable folder indexing.

Replaces the reference's serial one-image-at-a-time loop (`create_index`,
oldapp.py:54-90; batch size 1, full Python round-trip per image) with a
batched pipeline: host decode/prepare -> device fused preprocess+encode in
``batch_size`` chunks -> shard store appends. Per-image decode failures are
logged and skipped, exactly like the reference (oldapp.py:79-80), and
progress is durable at shard granularity so a crashed run resumes.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Iterable

import numpy as np

from ..utils import get_logger
from .store import IndexWriter, load_progress

log = get_logger("index.builder")

# Reference extension set (config.py:39); scan is non-recursive and
# case-sensitive like the reference's per-extension glob (oldapp.py:64-65),
# but deterministic: extensions and matches are sorted.
DEFAULT_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def scan_folder(
    folder: str | os.PathLike, extensions: Iterable[str] = DEFAULT_EXTENSIONS
) -> list[Path]:
    folder = Path(folder)
    found: list[Path] = []
    for ext in sorted(extensions):
        found.extend(sorted(folder.glob(f"*{ext}")))
    return found


def build_index(
    folder: str | os.PathLike,
    encode_batch: Callable[[list], np.ndarray],
    model_name: str,
    dim: int,
    batch_size: int = 32,
    dtype_name: str = "float32",
    extensions: Iterable[str] = DEFAULT_EXTENSIONS,
    index_folder_name: str = ".clip_index",
    resume: bool = False,
    rows_per_shard: int | None = None,
    fast_decode: bool = True,
    decode_short_side: int = 448,
) -> int:
    """Index every image in ``folder``; returns number of rows written.

    ``encode_batch``: list of PIL images / uint8 RGB arrays -> (B, dim)
    float32 embeddings (the engine provides preprocess+encode fused on
    device). Returns 0 and writes nothing when the folder has no readable
    images (reference returns None -> HTTP 400, oldapp.py:82-83/1964).
    ``fast_decode`` enables the native DCT-scaled JPEG decoder.
    """
    from ..preprocess.io import load_image_rgb

    paths = scan_folder(folder, extensions)
    done: set[str] = set()
    writer = None
    if resume:
        writer = IndexWriter.resume(
            folder, model_name, dim, index_folder_name=index_folder_name
        )
        if writer is not None:
            done = load_progress(folder, index_folder_name)
            log.info("resuming indexing of %s: %d rows already embedded",
                     folder, len(done))
    if writer is None:
        kwargs = {}
        if rows_per_shard is not None:
            kwargs["rows_per_shard"] = rows_per_shard
        writer = IndexWriter.create(
            folder, model=model_name, dim=dim, dtype_name=dtype_name,
            index_folder_name=index_folder_name, **kwargs,
        )

    pending_imgs: list = []
    pending_paths: list[str] = []
    pending_meta: list[dict] = []

    def flush():
        nonlocal pending_imgs, pending_paths, pending_meta
        if not pending_imgs:
            return
        emb = np.asarray(encode_batch(pending_imgs), dtype=np.float32)
        writer.append(emb, pending_paths, pending_meta)
        pending_imgs, pending_paths, pending_meta = [], [], []

    for img_path in paths:
        spath = str(img_path)
        if spath in done:
            continue
        try:
            img = load_image_rgb(
                img_path,
                min_short_side=decode_short_side if fast_decode else 0,
                fast=fast_decode,
            )
            stat = img_path.stat()
        except Exception as e:  # skip-and-continue (oldapp.py:79-80)
            log.warning("Error processing %s: %s", img_path, e)
            continue
        pending_imgs.append(img)
        pending_paths.append(spath)
        pending_meta.append(
            {"path": spath, "mtime": stat.st_mtime, "size": stat.st_size}
        )
        if len(pending_imgs) >= batch_size:
            flush()
    flush()

    if writer.count == 0:
        return 0
    writer.finalize()
    log.info("indexed %d images in %s", writer.count, folder)
    return writer.count
