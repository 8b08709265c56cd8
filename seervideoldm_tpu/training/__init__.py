from .optim import build_optimizer, trainable_mask, lr_schedule
from .meters import RunningAverageMeter
from .trainer import (
    TrainState,
    make_train_step,
    prepare_batch_fn,
    partition_params,
    combine_params,
)

__all__ = [
    "build_optimizer",
    "trainable_mask",
    "lr_schedule",
    "RunningAverageMeter",
    "TrainState",
    "partition_params",
    "combine_params",
    "make_train_step",
    "prepare_batch_fn",
]
