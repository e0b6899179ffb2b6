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

    def _canonical(self, arr: np.ndarray) -> np.ndarray:
        """Host resample+crop to (target, target), mirroring the device
        stage's math (two resample GEMMs with inter-pass round/clamp).

        Training batches must be STATIC-shape — a shrunken or
        mixed-size batch retraces the jitted fwd+bwd step (minutes of
        recompile per distinct shape) and unbalances mesh sharding —
        so every image is canonicalized to one size here and
        prepare_batch always sees U=1 unique size (also sidestepping
        the per-unique-size matrix blowup MAX_UNIQUE_SIZES bounds on
        the serving path)."""
        from ..preprocess.pipeline import (
            DEFAULT_MAX_SIDE, _host_shrink, host_apply_resample,
        )
        from ..preprocess.resize import clip_resize_crop_matrices

        t = self.spec.image_size
        if arr.shape[0] > DEFAULT_MAX_SIDE or arr.shape[1] > DEFAULT_MAX_SIDE:
            # oversized photos pre-shrink like the serving path — a
            # direct 12000->224 matrix pair would einsum a ~GB f32
            # intermediate on the 1-core host
            arr = _host_shrink(arr, DEFAULT_MAX_SIDE, t)
        h, w = arr.shape[:2]
        if (h, w) == (t, t):
            return arr
        mh, mw = clip_resize_crop_matrices(h, w, t)
        return host_apply_resample(arr, mh, mw)

    def epoch(self):
        """Yields (canvases, a_h_u, a_w_u, size_idx, tokens) batches of
        EXACTLY batch_size rows (failed decodes are skipped and the
        batch topped up from later items; the ragged tail is dropped —
        static shapes, and the contrastive loss needs full batches of
        negatives).

        Decode + canonicalize run in a PRODUCER thread, bounded two
        batches ahead: the device's fwd+bwd step overlaps the next
        batch's host decode instead of serializing with it (the same
        overlap the indexing pipeline gets from _pipelined_build).
        JPEGs decode DCT-scaled to the model's input size like the
        indexing path (embedding cosine vs full decode > 0.9999) — full
        12 MP decodes on the 1-core host dominated epoch time. If the
        consumer abandons the generator mid-epoch the daemon producer
        parks on the bounded queue until process exit (the training
        loop always drains its epochs)."""
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        _end = object()

        def produce():
            try:
                order = self.rng.permutation(len(self.items))
                pending: list[tuple[np.ndarray, str]] = []
                yielded = 0
                for start in range(0, len(order), self.batch_size):
                    chunk = [
                        self.items[i]
                        for i in order[start : start + self.batch_size]
                    ]
                    arrays = load_batch_rgb(
                        [p for p, _ in chunk],
                        min_short_side=self.spec.image_size,
                    )
                    for a, (_, cap) in zip(arrays, chunk):
                        if a is None:
                            continue
                        pending.append((self._canonical(a), cap))
                        if len(pending) == self.batch_size:
                            q.put(self._finalize(pending))
                            yielded += 1
                            pending = []
                # ragged tail: normally dropped for static shapes, but
                # when NO full batch came out of the whole epoch (tiny
                # dataset, or decode failures ate the margin) training
                # must still see the data — one smaller batch beats zero
                # steps and a NaN history.
                if pending and yielded == 0 and len(pending) >= 2:
                    q.put(self._finalize(pending))
            except BaseException as e:  # surface in the consumer
                q.put(e)
                return
            q.put(_end)

        threading.Thread(
            target=produce, name="pair-loader", daemon=True
        ).start()
        while True:
            item = q.get()
            if item is _end:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def _finalize(self, pending):
        canv, a_h, a_w, idx = prepare_batch(
            [a for a, _ in pending], target=self.spec.image_size
        )
        tokens = self.tokenizer.tokenize(
            [cap for _, cap in pending], self.spec.context_length, truncate=True
        )
        return canv, a_h, a_w, idx, tokens
