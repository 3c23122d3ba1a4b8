"""Data layer (reference: look2hear/datas/__init__.py:7-14)."""

from .dataset import (
    Libri2MixDataset,
    LRS2Dataset,
    LRS2TwoStepDataset,
    LRS3Dataset,
    ManifestDataset,
    WhamDataset,
    normalize_wav,
)
from .datamodules import (
    BaseDataModule,
    Libri2MixDataModule,
    LRS2DataModule,
    LRS2TwoStepDataModule,
    LRS3DataModule,
    WhamDataModule,
)
from .loader import DataLoader
from .wsj0 import WSJ0DataModule, WSJ0Dataset

__all__ = [
    "ManifestDataset",
    "LRS2Dataset",
    "LRS3Dataset",
    "Libri2MixDataset",
    "WhamDataset",
    "LRS2TwoStepDataset",
    "WSJ0Dataset",
    "BaseDataModule",
    "LRS2DataModule",
    "LRS3DataModule",
    "Libri2MixDataModule",
    "WhamDataModule",
    "LRS2TwoStepDataModule",
    "WSJ0DataModule",
    "DataLoader",
    "normalize_wav",
]


def get(name):
    """String → datamodule class (reference getattr reflection)."""
    if callable(name):
        return name
    obj = globals().get(name)
    if obj is None:
        raise ValueError(f"Could not interpret datamodule identifier: {name}")
    return obj

from .extra_datasets import AudioSlientDataset, AVSpeechDataset, MixITDataset  # noqa: E402
from .transform import get_preprocessing_pipelines  # noqa: E402

__all__ += [
    "MixITDataset",
    "AudioSlientDataset",
    "AVSpeechDataset",
    "get_preprocessing_pipelines",
]
