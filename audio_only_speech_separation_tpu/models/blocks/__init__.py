"""Shared model building blocks (reference: look2hear/models/utils/)."""

from .tac import TAC
from .gc_rnn import GC_RNN
from .dprnn import DPRNNCore
from .dptnet import DPTNetCore, TransformerEncoderLayerDPT
from .tcn import DepthConv1d, TCN, GC_TCN
from .sudo import UConvBlock, GC_UConvBlock

__all__ = [
    "TAC",
    "GC_RNN",
    "DPRNNCore",
    "DPTNetCore",
    "TransformerEncoderLayerDPT",
    "DepthConv1d",
    "TCN",
    "GC_TCN",
    "UConvBlock",
    "GC_UConvBlock",
]
