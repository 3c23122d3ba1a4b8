"""Reusable conv/RNN/transformer blocks (reference: look2hear/layers/
cnnlayers.py + rnnlayers.py subset actually useful downstream).

These mirror the reference's exported layer-library surface; heavy lifting
is delegated to ops (scan-LSTM, MXU convs, MHA).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.attention import MultiheadAttention, sinusoidal_positions
from ..ops.conv import Conv1d, PointwiseConv
from ..ops.norms import GlobalLayerNorm, get_norm
from ..ops.resample import interpolate_nearest
from ..ops.rnn import BiLSTM, LSTM


class ConvNormAct(nn.Module):
    """Conv1d + gLN + PReLU (reference cnnlayers.py ConvNormAct)."""

    out_channels: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv1d(
            self.out_channels,
            kernel_size=self.kernel,
            stride=self.stride,
            padding=(self.kernel - 1) // 2,
            groups=self.groups,
            name="conv",
        )(x)
        y = GlobalLayerNorm(self.out_channels, eps=1e-8, name="norm")(y)
        return PReLU(name="act")(y)


class ConvNorm(nn.Module):
    out_channels: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = Conv1d(
            self.out_channels,
            kernel_size=self.kernel,
            stride=self.stride,
            padding=(self.kernel - 1) // 2,
            groups=self.groups,
            use_bias=self.use_bias,
            name="conv",
        )(x)
        return GlobalLayerNorm(self.out_channels, eps=1e-8, name="norm")(y)


class Conv1DBlock(nn.Module):
    """TCN block: 1×1 → PReLU+norm → dilated depthwise → PReLU+norm →
    (residual 1×1, skip 1×1) (reference cnnlayers.py Conv1DBlock)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 3
    dilation: int = 1
    norm_type: str = "gLN"

    @nn.compact
    def __call__(self, x):
        norm_cls = get_norm(self.norm_type)
        pad = (self.dilation * (self.kernel_size - 1)) // 2
        h = PointwiseConv(self.hid_chan, name="in_conv")(x)
        h = norm_cls(self.hid_chan, name="norm1")(PReLU(name="act1")(h))
        h = Conv1d(
            self.hid_chan,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=pad,
            groups=self.hid_chan,
            name="dconv",
        )(h)
        h = norm_cls(self.hid_chan, name="norm2")(PReLU(name="act2")(h))
        res = PointwiseConv(self.in_chan, name="res_conv")(h)
        skip = PointwiseConv(self.in_chan, name="skip_conv")(h)
        return x + res, skip


class FRCNNBlock(nn.Module):
    """Multi-scale fusion block (reference cnnlayers.py:250-399): parallel
    resolutions with neighbor up/down fusion + concat."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):
        D, C = self.upsampling_depth, self.in_channels
        residual = x
        y = ConvNormAct(C, 1, name="proj")(x)
        scales = [ConvNormAct(C, 5, groups=C, name="down_0")(y)]
        for k in range(1, D):
            scales.append(
                ConvNormAct(C, 5, stride=2, groups=C, name=f"down_{k}")(scales[-1])
            )
        fused = []
        for i in range(D):
            T_i = scales[i].shape[-1]
            parts = []
            if i > 0:
                parts.append(
                    ConvNorm(C, 5, stride=2, groups=C, name=f"fuse_down_{i}")(scales[i - 1])
                )
            parts.append(scales[i])
            if i + 1 < D:
                parts.append(interpolate_nearest(scales[i + 1], T_i))
            fused.append(
                ConvNormAct(C, 1, name=f"concat_{i}")(jnp.concatenate(parts, axis=1))
            )
        T0 = scales[0].shape[-1]
        fused = [fused[0]] + [interpolate_nearest(f, T0) for f in fused[1:]]
        out = ConvNormAct(C, 1, name="last")(jnp.concatenate(fused, axis=1))
        return PointwiseConv(self.out_channels, name="res_conv")(out) + residual


class SingleRNN(nn.Module):
    """(Bi)LSTM returning raw hidden states (reference rnnlayers.py:40-94)."""

    hidden_size: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        if self.bidirectional:
            return BiLSTM(self.hidden_size, name="rnn")(x)
        return LSTM(self.hidden_size, name="rnn")(x)


class LSTMBlockTF(nn.Module):
    """Time-frequency LSTM block: BiLSTM + Dense projection + residual
    (reference rnnlayers.py:95-124)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        h = BiLSTM(self.hidden_size, name="rnn")(x)
        h = nn.Dense(x.shape[-1], name="proj")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + h)


class TransformerBlockTF(nn.Module):
    """Transformer encoder block with sinusoidal positions
    (reference rnnlayers.py:544-604)."""

    d_model: int
    n_head: int = 8
    d_ffn: int = 1024
    use_positions: bool = True

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        if self.use_positions:
            x = x + sinusoidal_positions(x.shape[1], self.d_model, x.dtype)[None]
        attn = MultiheadAttention(self.d_model, self.n_head, name="attn")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        ffn = nn.Dense(self.d_ffn, name="ffn1")(x)
        ffn = nn.Dense(self.d_model, name="ffn2")(nn.relu(ffn))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ffn)


class DPRNNBlock(nn.Module):
    """One dual-path layer: intra BiLSTM + inter (Bi)LSTM with norms
    (reference rnnlayers.py:605-792)."""

    hidden_size: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):  # [B, N, K, S]
        B, N, K, S = x.shape
        row = jnp.transpose(x, (0, 3, 2, 1)).reshape(B * S, K, N)
        row = nn.Dense(N, name="row_proj")(BiLSTM(self.hidden_size, name="row_rnn")(row))
        row = jnp.transpose(row.reshape(B, S, K, N), (0, 3, 2, 1))
        x = x + GlobalLayerNorm(N, eps=1e-8, name="row_norm")(row)
        col = jnp.transpose(x, (0, 2, 3, 1)).reshape(B * K, S, N)
        if self.bidirectional:
            col_h = BiLSTM(self.hidden_size, name="col_rnn")(col)
        else:
            col_h = LSTM(self.hidden_size, name="col_rnn")(col)
        col = nn.Dense(N, name="col_proj")(col_h)
        col = jnp.transpose(col.reshape(B, K, S, N), (0, 3, 1, 2))
        return x + GlobalLayerNorm(N, eps=1e-8, name="col_norm")(col)


class DPRNN(nn.Module):
    """Stacked DPRNNBlocks with a 1×1 output head."""

    hidden_size: int
    n_repeats: int = 6
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x):  # [B, N, K, S]
        for i in range(self.n_repeats):
            x = DPRNNBlock(self.hidden_size, name=f"block_{i}")(x)
        if self.out_channels is not None:
            B, N, K, S = x.shape
            w = self.param("out_kernel", nn.initializers.lecun_normal(), (N, self.out_channels))
            x = jnp.einsum("bnks,nm->bmks", x, w)
        return x
