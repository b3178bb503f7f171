from .losses import (LOSSES, weighted_cross_entropy, cross_fusion_loss,
                     endnet_loss, focal_loss)
from .optim import OptimizerSpec, build_lr_schedule, build_optimizer
from .state import TrainState
from .loop import Trainer, TrainLog
from .checkpoint import save_checkpoint, restore_checkpoint
from .pretrain import Pretrainer, adjust_learning_rate

__all__ = [
    "LOSSES", "weighted_cross_entropy", "cross_fusion_loss", "endnet_loss",
    "focal_loss", "OptimizerSpec", "build_lr_schedule", "build_optimizer",
    "TrainState", "Trainer", "TrainLog", "save_checkpoint",
    "restore_checkpoint", "Pretrainer", "adjust_learning_rate",
]
