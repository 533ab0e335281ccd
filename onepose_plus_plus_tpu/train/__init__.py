from .losses import LossConfig, compute_losses, fine_supervision
from .train_step import (
    TrainConfig,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    train_step,
)

__all__ = [
    "LossConfig",
    "compute_losses",
    "fine_supervision",
    "TrainConfig",
    "create_train_state",
    "make_lr_schedule",
    "make_optimizer",
    "train_step",
]
from .callbacks import (
    Callback,
    GradientStatsCallback,
    CheckpointArtifactCallback,
    LearningRateCallback,
    run_callbacks_step,
    run_callbacks_epoch,
)
