"""Dilated depthwise TCN blocks (reference: look2hear/models/utils/tcn.py).

Each DepthConv1d: 1×1 expand → PReLU+gLN → dilated depthwise conv →
PReLU+gLN → 1×1 residual (+ optional 1×1 skip).  The TasNet TCN wrapper
stacks layer×stack blocks with dilations 2^i and sums skips.
"""

from __future__ import annotations

import flax.linen as nn

from ...ops.activations import PReLU
from ...ops.conv import Conv1d, PointwiseConv
from ...ops.norms import GlobalLayerNorm
from .tac import TAC


class DepthConv1d(nn.Module):
    """[B, C, T] → (residual, skip) — reference tcn.py:6-37."""

    input_channel: int
    hidden_channel: int
    kernel: int
    padding: int
    dilation: int = 1
    skip: bool = True

    @nn.compact
    def __call__(self, x):
        h = PointwiseConv(self.hidden_channel, name="conv1d")(x)
        h = GlobalLayerNorm(self.hidden_channel, eps=1e-8, name="reg1")(
            PReLU(name="act1")(h)
        )
        h = Conv1d(
            self.hidden_channel,
            kernel_size=self.kernel,
            dilation=self.dilation,
            padding=self.padding,
            groups=self.hidden_channel,
            name="dconv1d",
        )(h)
        h = GlobalLayerNorm(self.hidden_channel, eps=1e-8, name="reg2")(
            PReLU(name="act2")(h)
        )
        residual = PointwiseConv(self.input_channel, name="res_out")(h)
        if self.skip:
            skip = PointwiseConv(self.input_channel, name="skip_out")(h)
            return residual, skip
        return residual


class TCN(nn.Module):
    """TasNet-style TCN separator [B, N, T] → [B, out, T] (tcn.py:41-97)."""

    input_dim: int
    output_dim: int
    BN_dim: int
    hidden_dim: int
    layer: int
    stack: int
    kernel: int = 3
    skip: bool = True
    dilated: bool = True

    @nn.compact
    def __call__(self, x):
        out = GlobalLayerNorm(self.input_dim, eps=1e-8, name="LN")(x)
        out = PointwiseConv(self.BN_dim, name="BN")(out)
        skip_sum = 0.0
        idx = 0
        for s in range(self.stack):
            for i in range(self.layer):
                d = 2**i if self.dilated else 1
                block = DepthConv1d(
                    self.BN_dim,
                    self.hidden_dim,
                    self.kernel,
                    padding=d if self.dilated else 1,
                    dilation=d,
                    skip=self.skip,
                    name=f"block_{idx}",
                )
                if self.skip:
                    residual, skip = block(out)
                    out = out + residual
                    skip_sum = skip_sum + skip
                else:
                    out = out + block(out)
                idx += 1
        head_in = skip_sum if self.skip else out
        head = PReLU(name="out_act")(head_in)
        return PointwiseConv(self.output_dim, name="out_conv")(head)


class GC_TCN(nn.Module):
    """GroupComm TCN: TAC before every block on grouped channels
    (tcn.py:101-164).  [B, N, T] → [B, out, T]."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    layer: int
    stack: int
    kernel: int = 3
    skip: bool = True
    dilated: bool = True
    num_group: int = 2

    @nn.compact
    def __call__(self, x):
        B, N, T = x.shape
        G = self.num_group
        n = self.input_dim // G
        h = self.hidden_dim // G
        out = x.reshape(B, G, n, T)
        skip_sum = 0.0
        idx = 0
        for s in range(self.stack):
            for i in range(self.layer):
                d = 2**i if self.dilated else 1
                out = TAC(n, h * 3, name=f"tac_{idx}")(out)
                flat = out.reshape(B * G, n, T)
                block = DepthConv1d(
                    n,
                    h,
                    self.kernel,
                    padding=d if self.dilated else 1,
                    dilation=d,
                    skip=self.skip,
                    name=f"block_{idx}",
                )
                if self.skip:
                    residual, skip = block(flat)
                    out = (flat + residual).reshape(B, G, n, T)
                    skip_sum = skip_sum + skip
                else:
                    out = (flat + block(flat)).reshape(B, G, n, T)
                idx += 1
        if self.skip:
            head = PointwiseConv(self.output_dim // G, name="out_conv")(skip_sum)
        else:
            head = PointwiseConv(self.output_dim // G, name="out_conv")(
                out.reshape(B * G, n, T)
            )
        return head.reshape(B, -1, T)
