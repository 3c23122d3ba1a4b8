"""Training system (reference: look2hear/system/__init__.py:9-12)."""

from .optimizers import make_optimizer, get_learning_rate, set_learning_rate
from .schedulers import (
    CosineAnnealingLR,
    ExponentialLR,
    NoamLR,
    ReduceLROnPlateau,
    StepLR,
    make_scheduler,
)
from .checkpoints import CheckpointManager
from .system import AudioLightningModule, AudioSystem
from .trainer import EarlyStopping, ScalarLogger, Trainer

__all__ = [
    "make_optimizer",
    "get_learning_rate",
    "set_learning_rate",
    "make_scheduler",
    "ReduceLROnPlateau",
    "StepLR",
    "ExponentialLR",
    "CosineAnnealingLR",
    "NoamLR",
    "CheckpointManager",
    "AudioSystem",
    "AudioLightningModule",
    "EarlyStopping",
    "ScalarLogger",
    "Trainer",
]

from .loggers import CometLogger, CSVLogger, TensorBoardLogger, make_logger  # noqa: E402

__all__ += ["CSVLogger", "TensorBoardLogger", "CometLogger", "make_logger"]
