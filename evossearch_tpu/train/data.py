"""Image-text pair dataset for contrastive training.

Layout: a folder of images plus ``captions.json`` mapping filename ->
caption string. Batches are produced with the same fused preprocess used
for indexing (prepare_batch -> device resample+normalize) and the CLIP
tokenizer, shuffled per epoch with a seeded RNG.

The reference has no training data story at all; this is the minimal
TPU-friendly loader: host decode in a producer thread, static-shape
batches, ragged tail dropped (contrastive loss needs full batches of
negatives anyway).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..core.constants import CLIPModelSpec
from ..preprocess import prepare_batch
from ..preprocess.io import load_batch_rgb
from ..tokenizer import CLIPTokenizer


class PairDataset:
    def __init__(
        self,
        folder: str | Path,
        tokenizer: CLIPTokenizer,
        spec: CLIPModelSpec,
        batch_size: int = 32,
        seed: int = 0,
    ):
        self.folder = Path(folder)
        captions = json.loads((self.folder / "captions.json").read_text())
        self.items = [
            (self.folder / name, caption)
            for name, caption in sorted(captions.items())
            if (self.folder / name).exists()
        ]
        if not self.items:
            raise ValueError(f"no captioned images found in {folder}")
        self.tokenizer = tokenizer
        self.spec = spec
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.items) // self.batch_size

    def epoch(self):
        """Yields (canvases, a_h_u, a_w_u, size_idx, tokens) batches."""
        order = self.rng.permutation(len(self.items))
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            chunk = [self.items[i] for i in order[start : start + self.batch_size]]
            arrays = load_batch_rgb([p for p, _ in chunk])
            keep = [(a, cap) for a, (_, cap) in zip(arrays, chunk) if a is not None]
            if len(keep) < 2:  # contrastive loss needs negatives
                continue
            canv, a_h, a_w, idx = prepare_batch(
                [a for a, _ in keep], target=self.spec.image_size
            )
            tokens = self.tokenizer.tokenize(
                [cap for _, cap in keep], self.spec.context_length, truncate=True
            )
            yield canv, a_h, a_w, idx, tokens
