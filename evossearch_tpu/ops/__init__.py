from .topk_pallas import fused_topk

__all__ = ["fused_topk"]
