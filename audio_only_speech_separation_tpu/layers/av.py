"""Audio-visual + conformer + pyramid layers (reference: look2hear/layers/
cnnlayers.py:163-805, rnnlayers.py:228-543,793-927).

The remaining exported surface of the reference's dormant layer library:
video-branch conv blocks, audio/video fusion, bottom-up pyramids, conformer
pieces, and the Linear-projection dual-path variant.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import PReLU
from ..ops.conv import Conv1d, PointwiseConv
from ..ops.norms import BatchNorm1d, GlobalLayerNorm
from ..ops.resample import interpolate_nearest
from ..ops.rnn import BiLSTM
from .blocks import ConvNorm, ConvNormAct


class Video1DConv(nn.Module):
    """Video-branch depthwise conv block (reference cnnlayers.py:163-229).

    [B, N, T] → skip/residual pair (or single output without skip_con).
    """

    in_chan: int
    out_chan: int
    kernel_size: int
    dilation: int = 1
    residual: bool = True
    skip_con: bool = True
    first_block: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        y = x
        if not self.first_block:
            y = nn.relu(x)
            y = BatchNorm1d(self.in_chan, name="bn")(y, use_running_average)
        y = Conv1d(
            self.in_chan,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            padding=(self.dilation * (self.kernel_size - 1)) // 2,
            groups=self.in_chan,
            name="dconv",
        )(y)
        res = self.residual and not self.first_block
        if self.skip_con:
            skip = PointwiseConv(self.out_chan, name="sconv")(y)
            return skip, (y + x if res else y)
        y = PointwiseConv(self.out_chan, name="bconv")(y)
        return y + x if res else y


class Concat(nn.Module):
    """Audio/video fusion: upsample video to audio rate, concat, 1×1+PReLU
    (reference cnnlayers.py:231-249)."""

    ain_chan: int
    vin_chan: int
    out_chan: int

    @nn.compact
    def __call__(self, a, v):  # a: [B, A, Ta], v: [B, V, Tv]
        v = interpolate_nearest(v, a.shape[-1])
        y = jnp.concatenate([a, v], axis=1)
        y = PointwiseConv(self.out_chan, name="proj")(y)
        return PReLU(name="act")(y)


class Bottomup(nn.Module):
    """Bottom-up depthwise pyramid (reference cnnlayers.py:400-460).

    Returns (residual, deepest_scale, all_scales).
    """

    in_chan: int = 128
    out_chan: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvNormAct(self.out_chan, 1, name="proj_1x1")(x)
        scales = [ConvNorm(self.out_chan, 5, groups=self.out_chan, name="spp_0")(y)]
        for k in range(1, self.upsampling_depth):
            scales.append(
                ConvNorm(
                    self.out_chan, 5, stride=2, groups=self.out_chan, name=f"spp_{k}"
                )(scales[-1])
            )
        return residual, scales[-1], scales


class BottomupConcatTopdown(nn.Module):
    """Pyramid + top-down fusion back to full rate + residual 1×1
    (reference cnnlayers.py:506-604 family, distilled)."""

    in_chan: int = 128
    out_chan: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual, _, scales = Bottomup(
            self.in_chan, self.out_chan, self.upsampling_depth, name="bottomup"
        )(x)
        top = scales[-1]
        for k in range(self.upsampling_depth - 2, -1, -1):
            top = scales[k] + interpolate_nearest(top, scales[k].shape[-1])
        top = GlobalLayerNorm(self.out_chan, eps=1e-8, name="fuse_norm")(top)
        return PointwiseConv(self.in_chan, name="res_conv")(top) + residual


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL style relative-position MHA
    (reference rnnlayers.py:228-328).  [B, T, D] → [B, T, D]."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key=None, value=None, pos_embedding=None):
        key = query if key is None else key
        value = key if value is None else value
        B, T, D = query.shape
        h = self.num_heads
        dh = D // h
        if pos_embedding is None:
            from ..ops.attention import sinusoidal_positions

            pos_embedding = sinusoidal_positions(T, D, query.dtype)[None]
        q = nn.Dense(D, name="query_proj")(query).reshape(B, T, h, dh)
        k = nn.Dense(D, name="key_proj")(key).reshape(B, -1, h, dh)
        v = nn.Dense(D, name="value_proj")(value).reshape(B, -1, h, dh)
        pos = nn.Dense(D, use_bias=False, name="pos_proj")(pos_embedding)
        pos = pos.reshape(1, -1, h, dh)
        u = self.param("u_bias", nn.initializers.zeros, (h, dh))
        w = self.param("v_bias", nn.initializers.zeros, (h, dh))

        content = jnp.einsum("bqhd,bkhd->bhqk", q + u[None, None], k)
        pos_score = jnp.einsum("bqhd,bkhd->bhqk", q + w[None, None], pos)
        pos_score = self._rel_shift(pos_score)
        score = (content + pos_score) / np.sqrt(dh)
        attn = jax.nn.softmax(score, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out)

    @staticmethod
    def _rel_shift(x):
        """Relative-position shift trick (rnnlayers.py:316-328)."""
        B, H, T1, T2 = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
        x = x.reshape(B, H, T2 + 1, T1)[:, :, 1:]
        return x.reshape(B, H, T1, T2)


class MultiHeadedSelfAttentionModule(nn.Module):
    """Pre-norm relative MHA + residual (reference rnnlayers.py:329-380)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = RelativeMultiHeadAttention(self.d_model, self.num_heads, name="attn")(y)
        return x + y


class ConformerConvModule(nn.Module):
    """Conformer conv block: LN → pointwise×2(GLU) → depthwise → BN-ish →
    swish → pointwise (reference rnnlayers.py:490-543)."""

    in_channels: int
    kernel_size: int = 31
    expansion_factor: int = 2

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        D = self.in_channels
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = jnp.swapaxes(y, 1, 2)  # [B, D, T]
        y = PointwiseConv(D * self.expansion_factor * 2, name="pw1")(y)
        a, b = jnp.split(y, 2, axis=1)
        y = a * jax.nn.sigmoid(b)  # GLU
        y = Conv1d(
            D * self.expansion_factor,
            kernel_size=self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            groups=D * self.expansion_factor,
            name="dw",
        )(y)
        y = GlobalLayerNorm(D * self.expansion_factor, eps=1e-5, name="bn")(y)
        y = y * jax.nn.sigmoid(y)  # swish
        y = PointwiseConv(D, name="pw2")(y)
        return x + jnp.swapaxes(y, 1, 2)


class DPRNNLinear(nn.Module):
    """Dual-path block with Linear (not RNN) inter-chunk path
    (reference rnnlayers.py:793-927).  [B, N, K, S] → same."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        B, N, K, S = x.shape
        row = jnp.transpose(x, (0, 3, 2, 1)).reshape(B * S, K, N)
        row = nn.Dense(N, name="row_proj")(
            BiLSTM(self.hidden_size, name="row_rnn")(row)
        )
        row = jnp.transpose(row.reshape(B, S, K, N), (0, 3, 2, 1))
        x = x + GlobalLayerNorm(N, eps=1e-8, name="row_norm")(row)
        # inter-chunk via Linear over the chunk-index axis
        col = jnp.transpose(x, (0, 2, 3, 1))  # [B, K, S, N]
        col = nn.Dense(S, name="col_linear")(jnp.swapaxes(col, 2, 3))  # over S
        col = jnp.swapaxes(col, 2, 3)
        col = jnp.transpose(col, (0, 3, 1, 2))
        return x + GlobalLayerNorm(N, eps=1e-8, name="col_norm")(col)
