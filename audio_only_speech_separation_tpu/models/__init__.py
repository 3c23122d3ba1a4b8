"""Model zoo + registry (reference: look2hear/models/__init__.py:7-56)."""

from ..utils.registry import Registry
from .base import BaseModel, from_pretrain, serialize, save_serialized

_registry = Registry("model")


def register_model(cls=None, *, name=None):
    return _registry.register(cls, name=name)


def get(name):
    """String → model class; passthrough for classes."""
    return _registry.get(name)


def available_models():
    return _registry.keys()


# Import model families so they self-register.
from .tasnet import TasNet  # noqa: E402
from .convtasnet import ConvTasNet  # noqa: E402
from .bsrnn import BSRNN  # noqa: E402
from .tdanet import TDANet  # noqa: E402
from .afrcnn import AFRCNN  # noqa: E402
from .sepformer import Sepformer  # noqa: E402
from .dprnn_old import DPRNNTasNet  # noqa: E402
from .sandglasset import Sandglasset  # noqa: E402

__all__ = [
    "BaseModel",
    "TasNet",
    "ConvTasNet",
    "BSRNN",
    "TDANet",
    "AFRCNN",
    "Sepformer",
    "DPRNNTasNet",
    "Sandglasset",
    "register_model",
    "get",
    "available_models",
    "from_pretrain",
    "serialize",
    "save_serialized",
]
