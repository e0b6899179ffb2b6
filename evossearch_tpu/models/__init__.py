from .clip import (
    count_params,
    encode_image,
    encode_text,
    expected_param_count,
    init_params,
)
from .convert import from_hf_state_dict, from_openai_state_dict, load_checkpoint
from .layers import TowerConfig, quick_gelu

__all__ = [
    "count_params",
    "expected_param_count",
    "encode_image",
    "encode_text",
    "init_params",
    "from_hf_state_dict",
    "from_openai_state_dict",
    "load_checkpoint",
    "TowerConfig",
    "quick_gelu",
]
