from .contrastive import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_shardings,
    clip_loss,
    clip_param_shardings,
    clip_param_specs,
    make_optimizer,
    make_train_step,
    train_mesh,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_shardings",
    "clip_loss",
    "clip_param_shardings",
    "clip_param_specs",
    "make_optimizer",
    "make_train_step",
    "train_mesh",
]
