from .topk_pallas import fused_topk, fused_topk_batch

__all__ = ["fused_topk", "fused_topk_batch"]
