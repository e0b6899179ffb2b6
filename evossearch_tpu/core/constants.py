"""CLIP model constants and architecture table.

The numeric constants reproduce the OpenAI CLIP release so that converted
checkpoints are numerically faithful (reference usage: oldapp.py:28 loads
`clip.load(config.CLIP_MODEL)`; the preprocessing constants live inside the
upstream `clip` package's `_transform`).
"""

from __future__ import annotations

import dataclasses

# torchvision.transforms.Normalize constants used by OpenAI CLIP's preprocess.
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

# Text tokenizer constants (OpenAI byte-BPE release).
CLIP_VOCAB_SIZE = 49408
CLIP_CONTEXT_LENGTH = 77
CLIP_SOT_TOKEN = 49406  # <|startoftext|>
CLIP_EOT_TOKEN = 49407  # <|endoftext|>


@dataclasses.dataclass(frozen=True)
class CLIPModelSpec:
    """Architecture hyperparameters for one CLIP variant."""

    name: str
    # Vision tower
    image_size: int
    patch_size: int
    vision_width: int
    vision_layers: int
    vision_heads: int
    # Text tower
    text_width: int
    text_layers: int
    text_heads: int
    vocab_size: int
    context_length: int
    # Joint space
    embed_dim: int

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_image_tokens(self) -> int:
        return self.grid_size * self.grid_size + 1  # + class token


# Dimension table for the variants the reference UI offers
# (oldapp.py:1089-1091: ViT-B/32, ViT-B/16, ViT-L/14), plus
# ViT-L/14@336px — not in the reference dropdown, but `clip.load`
# (oldapp.py:28) accepts it via EVOSSEARCH_CLIP_MODEL, so capability
# parity requires the spec.
CLIP_MODEL_SPECS: dict[str, CLIPModelSpec] = {
    "ViT-B/32": CLIPModelSpec(
        name="ViT-B/32",
        image_size=224, patch_size=32,
        vision_width=768, vision_layers=12, vision_heads=12,
        text_width=512, text_layers=12, text_heads=8,
        vocab_size=CLIP_VOCAB_SIZE, context_length=CLIP_CONTEXT_LENGTH,
        embed_dim=512,
    ),
    "ViT-B/16": CLIPModelSpec(
        name="ViT-B/16",
        image_size=224, patch_size=16,
        vision_width=768, vision_layers=12, vision_heads=12,
        text_width=512, text_layers=12, text_heads=8,
        vocab_size=CLIP_VOCAB_SIZE, context_length=CLIP_CONTEXT_LENGTH,
        embed_dim=512,
    ),
    "ViT-L/14": CLIPModelSpec(
        name="ViT-L/14",
        image_size=224, patch_size=14,
        vision_width=1024, vision_layers=24, vision_heads=16,
        text_width=768, text_layers=12, text_heads=12,
        vocab_size=CLIP_VOCAB_SIZE, context_length=CLIP_CONTEXT_LENGTH,
        embed_dim=768,
    ),
    # Same tower as ViT-L/14 at 336 px input: grid 24 -> 577 image tokens,
    # vision positional embedding is the only larger tensor.
    "ViT-L/14@336px": CLIPModelSpec(
        name="ViT-L/14@336px",
        image_size=336, patch_size=14,
        vision_width=1024, vision_layers=24, vision_heads=16,
        text_width=768, text_layers=12, text_heads=12,
        vocab_size=CLIP_VOCAB_SIZE, context_length=CLIP_CONTEXT_LENGTH,
        embed_dim=768,
    ),
}
