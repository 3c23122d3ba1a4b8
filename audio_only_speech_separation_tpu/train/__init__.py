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
from .trainer import EarlyStopping, Trainer

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
    "Trainer",
]

from .loggers import (  # noqa: E402
    CometLogger,
    CSVLogger,
    TensorBoardLogger,
    make_default_logger,
    make_logger,
)

__all__ += [
    "CSVLogger",
    "TensorBoardLogger",
    "CometLogger",
    "make_logger",
    "make_default_logger",
]
