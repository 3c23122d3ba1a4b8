"""SudoRM-RF U-ConvBlocks (reference: look2hear/models/utils/sudo_rm_rf.py).

U-ConvBlock: 1×1 project up → depthwise pyramid with stride-2 downsampling →
nearest ×2 upsampling sum collapse → norm → 1×1 residual.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.activations import PReLU
from ...ops.conv import Conv1d, PointwiseConv
from ...ops.norms import GlobalLayerNorm
from .tac import TAC


class ConvNormAct(nn.Module):
    out_channels: int
    kernel: int
    stride: int = 1
    groups: int = 1
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        y = Conv1d(
            self.out_channels,
            kernel_size=self.kernel,
            stride=self.stride,
            padding=pad,
            groups=self.groups,
            channels_last=self.channels_last,
            name="conv",
        )(x)
        y = GlobalLayerNorm(
            self.out_channels, eps=1e-8, channels_last=self.channels_last, name="norm"
        )(y)
        return PReLU(name="act")(y)


class ConvNorm(nn.Module):
    """Conv1d + gLN (no activation) — reference tdanet.py:97-116."""

    out_channels: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        y = Conv1d(
            self.out_channels,
            kernel_size=self.kernel,
            stride=self.stride,
            padding=pad,
            groups=self.groups,
            use_bias=self.use_bias,
            channels_last=self.channels_last,
            name="conv",
        )(x)
        return GlobalLayerNorm(
            self.out_channels, eps=1e-8, channels_last=self.channels_last, name="norm"
        )(y)


class DilatedConvNorm(nn.Module):
    out_channels: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel - 1) // 2) * self.dilation
        y = Conv1d(
            self.out_channels,
            kernel_size=self.kernel,
            stride=self.stride,
            padding=pad,
            dilation=self.dilation,
            groups=self.groups,
            channels_last=self.channels_last,
            name="conv",
        )(x)
        return GlobalLayerNorm(
            self.out_channels, eps=1e-8, channels_last=self.channels_last, name="norm"
        )(y)


def upsample2_nearest(x):
    """[B, C, T] → [B, C, 2T] nearest (torch Upsample(scale_factor=2))."""
    return jnp.repeat(x, 2, axis=-1)


class UConvBlock(nn.Module):
    """[B, out_channels, T] → same (reference sudo_rm_rf.py:147-206)."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvNormAct(self.in_channels, 1, name="proj_1x1")(x)
        pyramid = [
            DilatedConvNorm(
                self.in_channels, 5, stride=1, groups=self.in_channels, name="spp_0"
            )(y)
        ]
        for k in range(1, self.upsampling_depth):
            pyramid.append(
                DilatedConvNorm(
                    self.in_channels,
                    5,
                    stride=2,
                    groups=self.in_channels,
                    name=f"spp_{k}",
                )(pyramid[-1])
            )
        # collapse: upsample deepest, add to the next, repeat
        for _ in range(self.upsampling_depth - 1):
            up = upsample2_nearest(pyramid.pop(-1))
            tgt = pyramid[-1]
            if up.shape[-1] > tgt.shape[-1]:
                up = up[..., : tgt.shape[-1]]
            elif up.shape[-1] < tgt.shape[-1]:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, tgt.shape[-1] - up.shape[-1])))
            pyramid[-1] = tgt + up
        expanded = PReLU(name="final_act")(
            GlobalLayerNorm(self.in_channels, eps=1e-8, name="final_norm")(pyramid[-1])
        )
        return PointwiseConv(self.out_channels, name="res_conv")(expanded) + residual


class GC_UConvBlock(nn.Module):
    """TAC across groups + per-group UConvBlock (sudo_rm_rf.py:210-236)."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4
    num_group: int = 16

    @nn.compact
    def __call__(self, x):
        B, N, L = x.shape
        G = self.num_group
        y = TAC(self.out_channels // G, self.out_channels * 3 // G, name="tac")(
            x.reshape(B, G, -1, L)
        ).reshape(B * G, -1, L)
        y = UConvBlock(
            self.out_channels // G,
            self.in_channels // G,
            self.upsampling_depth,
            name="ublock",
        )(y)
        return y.reshape(B, N, L)
