"""TDANet — top-down attention encoder-decoder (reference: tdanet.py:407-527).

UConvBlock pyramid (stride-2 depthwise downsampling) → pooled multi-scale
sum → GlobalAttention (MHA + conv-MLP) → sigmoid-gated InjectionMultiSum
fusion back to each scale → weight-shared Recurrent iteration.

TPU mapping: the full model executes channels-last ([B, T, C]) — 1×1 convs
are MXU matmuls with minor contraction axes, depthwise convs are shifted
elementwise multiplies, pooling is reshape-mean and nearest upsampling a
broadcast repeat.  Parameter pytree matches the channels-first modules, so
reference-weight import is unchanged.

Reference quirks preserved exactly:
- MultiHeadAttention adds dropout(output) to *output*, not the input
  (tdanet.py:247) — at eval this doubles the attention output;
- the last_layer collapse at i == depth−2 fuses ``x_fused[i-1]`` (not i+1)
  and never touches the deepest scale (tdanet.py:362-366).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.attention import MultiheadAttention, sinusoidal_positions
from ..ops.conv import Conv1d, ConvTranspose1d, PointwiseConv
from ..ops.dropout import DropPath
from ..ops.norms import GlobalLayerNorm
from ..ops.resample import adaptive_avg_pool1d, interpolate_nearest
from . import register_model
from .base import BaseModel
from .blocks.dprnn import DepthwiseGate
from .blocks.sudo import ConvNorm, ConvNormAct, DilatedConvNorm


class Mlp(nn.Module):
    """1×1 → depthwise 5-conv → ReLU → drop → 1×1 → drop (tdanet.py:197-213)."""

    in_features: int
    hidden_size: int
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        h = ConvNorm(self.hidden_size, 1, use_bias=False, channels_last=True, name="fc1")(x)
        h = Conv1d(
            self.hidden_size,
            kernel_size=5,
            padding=2,
            groups=self.hidden_size,
            channels_last=True,
            name="dwconv",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = ConvNorm(self.in_features, 1, use_bias=False, channels_last=True, name="fc2")(h)
        return nn.Dropout(self.drop, deterministic=not train)(h)


class TDAAttention(nn.Module):
    """Pos-enc + LayerNorm + MHA + post-norm on [B, T, C] (tdanet.py:232-248).

    Faithful to TWO reference quirks:
    1. the batch-first [B, T, C] tensor is fed to a seq-first torch MHA
       (tdanet.py:246), so attention actually runs over the BATCH axis,
       batched over T (positions are still indexed by T);
    2. the residual is output + dropout(output) — at eval 2×output — not
       input + output (tdanet.py:247).
    """

    channels: int
    n_head: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        h = nn.LayerNorm(epsilon=1e-5, name="attn_in_norm")(x)
        h = h + sinusoidal_positions(h.shape[1], self.channels, h.dtype)[None]
        # (batch=T, seq=B): reference's seq-first misuse, replicated
        hq = jnp.swapaxes(h, 0, 1)  # [T, B, C]
        out = MultiheadAttention(
            self.channels, self.n_head, dropout=self.dropout, name="attn"
        )(hq, train=train)
        out = jnp.swapaxes(out, 0, 1)  # [B, T, C]
        # residual is output + dropout(output) — identity-doubled at eval
        return nn.LayerNorm(epsilon=1e-5, name="norm")(
            out + nn.Dropout(self.dropout, deterministic=not train)(out)
        )


class GlobalAttention(nn.Module):
    """attn/mlp residuals under DropPath 0.1 (tdanet.py:251-261,329)."""

    in_chan: int
    out_chan: int
    drop_path: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(TDAAttention(self.out_chan, name="attn")(x, train=train), train)
        x = x + dp(Mlp(self.out_chan, self.out_chan * 2, name="mlp")(x, train=train), train)
        return x


class InjectionMultiSum(nn.Module):
    """Sigmoid-gated local/global fusion (tdanet.py:264-290), on [B, T, C]."""

    inp: int
    oup: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x_local, x_global):
        groups = self.inp if self.inp == self.oup else 1
        T = x_local.shape[1]
        local_feat = ConvNorm(
            self.oup, self.kernel, groups=groups, use_bias=False,
            channels_last=True, name="local_embedding",
        )(x_local)
        g_act = ConvNorm(
            self.oup, self.kernel, groups=groups, use_bias=False,
            channels_last=True, name="global_act",
        )(x_global)
        sig = interpolate_nearest(nn.sigmoid(g_act), T, axis=1)
        g_feat = ConvNorm(
            self.oup, self.kernel, groups=groups, use_bias=False,
            channels_last=True, name="global_embedding",
        )(x_global)
        g_feat = interpolate_nearest(g_feat, T, axis=1)
        return local_feat * sig + g_feat


class TDAUConvBlock(nn.Module):
    """Pyramid + global attention + injection fusion (tdanet.py:293-368)."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        residual = x
        y = ConvNormAct(self.in_channels, 1, channels_last=True, name="proj_1x1")(x)
        pyramid = [
            DilatedConvNorm(
                self.in_channels, 5, stride=1, groups=self.in_channels,
                channels_last=True, name="spp_0",
            )(y)
        ]
        for k in range(1, self.upsampling_depth):
            pyramid.append(
                DilatedConvNorm(
                    self.in_channels, 5, stride=2, groups=self.in_channels,
                    channels_last=True, name=f"spp_{k}",
                )(pyramid[-1])
            )
        # global: pooled sum of all scales at the deepest resolution
        T_last = pyramid[-1].shape[1]
        global_f = sum(adaptive_avg_pool1d(f, T_last, axis=1) for f in pyramid)
        global_f = GlobalAttention(
            self.in_channels * self.upsampling_depth, self.in_channels, name="globalatt"
        )(global_f, train=train)

        fused = [
            InjectionMultiSum(self.in_channels, self.in_channels, name=f"fus_{i}")(
                pyramid[i], global_f
            )
            for i in range(self.upsampling_depth)
        ]

        expanded = None
        for i in range(self.upsampling_depth - 2, -1, -1):
            other = fused[i - 1] if i == self.upsampling_depth - 2 else expanded
            expanded = InjectionMultiSum(
                self.in_channels, self.in_channels, 5, name=f"last_{i}"
            )(fused[i], other)
        return (
            PointwiseConv(self.out_channels, channels_last=True, name="res_conv")(expanded)
            + residual
        )


class Recurrent(nn.Module):
    """Weight-shared iterated blocks with input re-injection (tdanet.py:371-404)."""

    out_channels: int
    in_channels: int
    upsampling_depth: int
    iters: int
    unfold: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, C]
        mixture = x
        if self.unfold:
            unet = TDAUConvBlock(
                self.out_channels, self.in_channels, self.upsampling_depth, name="unet"
            )
            gate = DepthwiseGate(self.out_channels, channels_last=True, name="concat_block")
            for i in range(self.iters):
                x = unet(x, train) if i == 0 else unet(gate(mixture + x), train)
        else:
            for i in range(self.iters):
                block = TDAUConvBlock(
                    self.out_channels,
                    self.in_channels,
                    self.upsampling_depth,
                    name=f"unet_{i}",
                )
                if i == 0:
                    x = block(x, train)
                else:
                    g = DepthwiseGate(
                        self.out_channels, channels_last=True, name=f"concat_block_{i-1}"
                    )
                    x = block(g(mixture + x), train)
        return x


@register_model
class TDANet(BaseModel):
    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21  # milliseconds (tdanet.py:426)
    num_sources: int = 2
    sample_rate: int = 16000
    unfold: bool = True

    @nn.compact
    def __call__(self, wav, train: bool = False):
        was_one_d = wav.ndim == 1
        if wav.ndim == 1:
            wav = wav[None]
        elif wav.ndim == 3:
            wav = wav[:, 0]

        k = self.enc_kernel_size * self.sample_rate // 1000
        stride = k // 4
        basis = k // 2 + 1
        B, T = wav.shape
        rest = k - (stride + T % k) % k
        if rest > 0:
            wav = jnp.pad(wav, ((0, 0), (0, rest)))
        wav = jnp.pad(wav, ((0, 0), (k - stride, k - stride)))

        # encoder conv(1→basis, k, stride, padding=k//2): framed matmul
        enc = Conv1d(
            basis,
            kernel_size=k,
            stride=stride,
            padding=k // 2,
            use_bias=False,
            channels_last=True,
            name="encoder",
        )(wav[:, :, None])  # [B, T', basis]
        s = enc
        h = GlobalLayerNorm(basis, eps=1e-8, channels_last=True, name="ln")(enc)
        h = PointwiseConv(self.out_channels, channels_last=True, name="bottleneck")(h)
        h = Recurrent(
            self.out_channels,
            self.in_channels,
            self.upsampling_depth,
            self.num_blocks,
            self.unfold,
            name="sm",
        )(h, train=train)
        h = PReLU(name="mask_act")(h)
        h = PointwiseConv(
            self.num_sources * basis, channels_last=True, name="mask_conv"
        )(h)
        # [B, T', spk·basis] → [B, T', spk, basis] (spk-major channel order,
        # same as the channels-first reshape (B, spk, basis, T'))
        mask = nn.relu(h.reshape(B, -1, self.num_sources, basis))
        masked = mask * s[:, :, None, :]  # [B, T', spk, basis]

        # decoder ConvTranspose1d(basis·spk → spk, k, stride, padding=k//2)
        dec = ConvTranspose1d(
            self.num_sources,
            kernel_size=k,
            stride=stride,
            use_bias=False,
            channels_last=True,
            name="decoder",
        )(masked.reshape(B, -1, self.num_sources * basis))
        p = k // 2
        dec = dec[:, :, p : dec.shape[-1] - p]
        crop = k - stride
        out = dec[:, :, crop : dec.shape[-1] - (rest + crop)]
        return out[0] if was_one_d else out
