"""Standalone reusable layer library (reference: look2hear/layers/).

The reference ships an asteroid-style layer library that nothing in-repo
imports (SURVEY.md §2.8) — it is exported API surface for downstream users
and AV models.  This package provides the same surface on the TPU stack:
filterbank factory, TCN/FRCNN conv blocks, RNN/transformer blocks, STFT
kernels, norms and activations.  Compute primitives are re-exported from
``ops`` so there is a single implementation of each kernel.
"""

from ..ops.activations import PReLU, get_activation
from ..ops.attention import MultiheadAttention, PositionalEncoding
from ..ops.norms import (
    BatchNorm1d as bN,
    CumulativeLayerNorm as cLN,
    FrameLayerNorm as LN,
    GlobalLayerNorm as gLN,
    get_norm,
)
from ..ops.stft import hann_window, istft, stft, stft_matmul
from .stft_lib import (
    STFT,
    forward_stft,
    init_kernel,
    init_window,
    inverse_stft,
    iSTFT,
    mel_filter,
    speed_perturb_filter,
    splice_feature,
)
from ..models.blocks.tac import TAC
from .enc_dec import Decoder, Encoder, Filterbank, FreeFB, make_enc_dec
from .blocks import (
    Conv1DBlock,
    ConvNorm,
    ConvNormAct,
    DPRNN,
    DPRNNBlock,
    FRCNNBlock,
    LSTMBlockTF,
    SingleRNN,
    TransformerBlockTF,
)

# norms registry alias (reference layers/normalizations.py:148)
get = get_norm

__all__ = [
    "Filterbank",
    "Encoder",
    "Decoder",
    "FreeFB",
    "make_enc_dec",
    "Conv1DBlock",
    "ConvNorm",
    "ConvNormAct",
    "FRCNNBlock",
    "SingleRNN",
    "LSTMBlockTF",
    "TransformerBlockTF",
    "DPRNN",
    "DPRNNBlock",
    "TAC",
    "gLN",
    "cLN",
    "LN",
    "bN",
    "get_norm",
    "get",
    "get_activation",
    "PReLU",
    "MultiheadAttention",
    "PositionalEncoding",
    "stft",
    "istft",
    "stft_matmul",
    "hann_window",
    "forward_stft",
    "inverse_stft",
    "STFT",
    "iSTFT",
    "init_window",
    "init_kernel",
    "mel_filter",
    "speed_perturb_filter",
    "splice_feature",
]

from .av import (  # noqa: E402
    Bottomup,
    BottomupConcatTopdown,
    Concat,
    ConformerConvModule,
    DPRNNLinear,
    MultiHeadedSelfAttentionModule,
    RelativeMultiHeadAttention,
    Video1DConv,
)

__all__ += [
    "Video1DConv",
    "Concat",
    "Bottomup",
    "BottomupConcatTopdown",
    "RelativeMultiHeadAttention",
    "MultiHeadedSelfAttentionModule",
    "ConformerConvModule",
    "DPRNNLinear",
]
