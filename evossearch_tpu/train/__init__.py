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
from .data import PairDataset
from .loop import fit, retrieval_accuracy

__all__ = [
    "PairDataset",
    "fit",
    "retrieval_accuracy",
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
