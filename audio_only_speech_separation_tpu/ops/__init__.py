"""TPU compute primitives.

Everything in this package is pure-functional JAX (or a flax.linen module
around it), designed for XLA/MXU mapping:

- ``conv``      learned filterbank encoder/decoder as framed matmuls
- ``chunk``     50%-overlap segmentation + overlap-add merge
- ``rnn``       fused-gate LSTM/GRU via lax.scan (input projection hoisted
                out of the scan as one large MXU matmul)
- ``norms``     gLN / cLN / LN / bN family (reference:
                look2hear/models/utils/normalizations.py:29-146)
- ``stft``      torch.stft/istft-compatible STFT in jnp
- ``attention`` MultiheadAttention + sinusoidal positions
- ``pallas``    hand-written TPU kernels for the hot paths
"""

from .chunk import split_feature, merge_feature, pad_segment
from .conv import frame_signal, overlap_add, ConvEncoder, ConvDecoder
from .norms import (
    GlobalLayerNorm,
    ChannelLayerNorm,
    CumulativeLayerNorm,
    FrameLayerNorm,
    BatchNorm1d,
    get_norm,
)
from .rnn import LSTM, BiLSTM, ProjRNN
from .stft import stft, istft
from .activations import get_activation, PReLU

__all__ = [
    "split_feature",
    "merge_feature",
    "pad_segment",
    "frame_signal",
    "overlap_add",
    "ConvEncoder",
    "ConvDecoder",
    "GlobalLayerNorm",
    "ChannelLayerNorm",
    "CumulativeLayerNorm",
    "FrameLayerNorm",
    "BatchNorm1d",
    "get_norm",
    "LSTM",
    "BiLSTM",
    "ProjRNN",
    "stft",
    "istft",
    "get_activation",
    "PReLU",
]
