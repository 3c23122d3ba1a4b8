"""DPRNNTasNet — the legacy DPRNN separation model
(reference: look2hear/models/dprnn_old.py:400-516).

Per-chunk dual-path RNN without TAC; encoder/decoder filterbanks with
stride = win // 4 and pad window = win (same pad quirk as ConvTasNet);
optional causal cLN path (full_causal — exposed for completeness).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.chunk import merge_feature, split_feature
from ..ops.conv import ConvDecoder, ConvEncoder, PointwiseConv
from ..ops.norms import CumulativeLayerNorm, GlobalLayerNorm
from ..ops.rnn import BiLSTM, LSTM
from . import register_model
from .base import BaseModel

_F32_EPS = float(np.finfo(np.float32).eps)


class SingleRNNProj(nn.Module):
    """(Bi)LSTM + Linear proj (reference dprnn_old.py:57-95)."""

    input_size: int
    hidden_size: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        if self.bidirectional:
            h = BiLSTM(self.hidden_size, name="rnn")(x)
        else:
            h = LSTM(self.hidden_size, name="rnn")(x)
        return nn.Dense(self.input_size, name="proj")(h)


class OldDPRNN(nn.Module):
    """Dual-path core without TAC (dprnn_old.py:99-196).

    Input [B, N, K, S] → [B, output_size, K, S].
    """

    input_size: int
    hidden_size: int
    output_size: int
    num_layers: int = 1
    bidirectional: bool = True
    full_causal: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, K, S = x.shape
        out = x
        for i in range(self.num_layers):
            row_bi = not self.full_causal
            row_in = jnp.transpose(out, (0, 3, 2, 1)).reshape(B * S, K, N)
            row_out = SingleRNNProj(
                N, self.hidden_size, bidirectional=row_bi, name=f"row_rnn_{i}"
            )(row_in)
            row_out = jnp.transpose(row_out.reshape(B, S, K, N), (0, 3, 2, 1))
            if self.full_causal:
                row_out = CumulativeLayerNorm(N, eps=1e-8, name=f"row_norm_{i}")(
                    row_out.reshape(B, N, K * S)
                ).reshape(B, N, K, S)
            else:
                row_out = GlobalLayerNorm(N, eps=1e-8, name=f"row_norm_{i}")(row_out)
            out = out + row_out

            col_bi = self.bidirectional and not self.full_causal
            col_in = jnp.transpose(out, (0, 2, 3, 1)).reshape(B * K, S, N)
            col_out = SingleRNNProj(
                N, self.hidden_size, bidirectional=col_bi, name=f"col_rnn_{i}"
            )(col_in)
            col_out = jnp.transpose(col_out.reshape(B, K, S, N), (0, 3, 1, 2))
            if col_bi:
                col_out = GlobalLayerNorm(N, eps=1e-8, name=f"col_norm_{i}")(col_out)
            else:
                col_out = CumulativeLayerNorm(N, eps=1e-8, name=f"col_norm_{i}")(
                    col_out.reshape(B, N, K * S)
                ).reshape(B, N, K, S)
            out = out + col_out

        w = self.param("out_kernel", nn.initializers.lecun_normal(), (N, self.output_size))
        b = self.param("out_bias", nn.initializers.zeros, (self.output_size,))
        return jnp.einsum("bnks,nm->bmks", out, w) + b[None, :, None, None]


@register_model
class DPRNNTasNet(BaseModel):
    feature_dim: int = 128
    hidden_dim: int = 256
    sample_rate: int = 16000
    win: int = 4  # milliseconds
    layer: int = 6
    segment_size: int = 32
    context: int = 1
    num_spk: int = 2
    bidirectional: bool = True
    rnn_type: str = "LSTM"

    @nn.compact
    def __call__(self, wav, train: bool = False):  # train: API uniformity; reference applies no dropout here
        was_one_d = wav.ndim == 1
        if wav.ndim == 1:
            wav = wav[None]
        elif wav.ndim == 3:
            wav = wav[:, 0]

        freq_win = self.sample_rate * self.win // 1000
        freq_stride = freq_win // 4
        basis = freq_win // 2 + 1
        B, T = wav.shape
        rest = freq_win - (freq_stride + T % freq_win) % freq_win
        if rest > 0:
            wav = jnp.pad(wav, ((0, 0), (0, rest)))
        wav = jnp.pad(wav, ((0, 0), (freq_win - freq_stride, freq_win - freq_stride)))

        mixture_w = ConvEncoder(basis, freq_win, freq_stride, name="encoder")(wav)
        normed = GlobalLayerNorm(basis, eps=_F32_EPS, name="freq_norm")(mixture_w)

        # DPRNNSep (dprnn_old.py:348-370)
        feat = PointwiseConv(self.feature_dim, use_bias=False, name="BN")(normed)
        chunks, chunk_rest = split_feature(feat, self.segment_size)
        out = OldDPRNN(
            self.feature_dim,
            self.hidden_dim,
            basis * self.num_spk,
            num_layers=self.layer,
            bidirectional=self.bidirectional,
            name="DPRNN",
        )(chunks)
        out = out.reshape(B * self.num_spk, basis, self.segment_size, -1)
        mask = merge_feature(out, chunk_rest).reshape(B, self.num_spk, basis, -1)

        est_spec = mask * mixture_w[:, None]
        dec = ConvDecoder(basis, freq_win, freq_stride, name="decoder")(
            est_spec.reshape(B * self.num_spk, basis, -1)
        ).reshape(B, self.num_spk, -1)
        crop = freq_win - freq_stride
        dec = dec[:, :, crop : dec.shape[-1] - (rest + crop)]
        return dec[0] if was_one_d else dec
