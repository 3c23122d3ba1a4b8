"""A-FRCNN — fully-recurrent multi-scale fusion (reference: afrcnn.py:246-364).

Parallel resolutions with neighbor up/down fusion + concat, iterated with
shared weights and input re-injection.

TPU mapping: the whole model executes channels-last ([B, T, C]) so every
1×1 conv is an MXU matmul with a minor contraction axis, depthwise convs
lower to shifted elementwise multiplies that fuse into their neighbors, and
nearest upsampling is a broadcast repeat — no gathers, no grouped-conv
lowering, no per-op relayout.  Parameters are identical to the
channels-first modules, so reference-weight import is unaffected.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.conv import Conv1d, ConvTranspose1d, PointwiseConv
from ..ops.norms import GlobalLayerNorm
from ..ops.resample import interpolate_nearest
from . import register_model
from .base import BaseModel
from .blocks.dprnn import DepthwiseGate
from .blocks.sudo import ConvNormAct, DilatedConvNorm


class FRCNNBlock(nn.Module):
    """One A-FRCNN block (reference afrcnn.py:154-224), on [B, T, C]."""

    out_channels: int = 128
    in_channels: int = 512
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        D = self.upsampling_depth
        C = self.in_channels
        residual = x
        y = ConvNormAct(C, 1, channels_last=True, name="proj_1x1")(x)
        scales = [
            DilatedConvNorm(C, 5, stride=1, groups=C, channels_last=True, name="spp_0")(y)
        ]
        for k in range(1, D):
            scales.append(
                DilatedConvNorm(
                    C, 5, stride=2, groups=C, channels_last=True, name=f"spp_{k}"
                )(scales[-1])
            )

        fused = []
        for i in range(D):
            T_i = scales[i].shape[1]
            parts = []
            if i - 1 >= 0:
                parts.append(
                    DilatedConvNorm(
                        C, 5, stride=2, groups=C, channels_last=True, name=f"down_{i}"
                    )(scales[i - 1])
                )
            parts.append(scales[i])
            if i + 1 < D:
                parts.append(interpolate_nearest(scales[i + 1], T_i, axis=1))
            y_i = jnp.concatenate(parts, axis=-1)
            fused.append(
                ConvNormAct(C, 1, channels_last=True, name=f"concat_{i}")(y_i)
            )

        T0 = scales[0].shape[1]
        fused = [fused[0]] + [interpolate_nearest(f, T0, axis=1) for f in fused[1:]]
        concat = ConvNormAct(C, 1, channels_last=True, name="last_layer")(
            jnp.concatenate(fused, axis=-1)
        )
        return (
            PointwiseConv(self.out_channels, channels_last=True, name="res_conv")(concat)
            + residual
        )


class RecurrentA(nn.Module):
    """Shared-weight iteration with re-injection (afrcnn.py:227-243)."""

    out_channels: int
    in_channels: int
    upsampling_depth: int
    iters: int

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        mixture = x
        block = FRCNNBlock(
            self.out_channels, self.in_channels, self.upsampling_depth, name="blocks"
        )
        gate = DepthwiseGate(self.out_channels, channels_last=True, name="concat_block")
        for i in range(self.iters):
            x = block(x) if i == 0 else block(gate(mixture + x))
        return x


@register_model
class AFRCNN(BaseModel):
    out_channels: int = 512
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 5
    enc_kernel_size: int = 1  # milliseconds (afrcnn.py:263)
    num_sources: int = 2
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, train: bool = False):  # train: API uniformity; reference applies no dropout here
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

        # encoder conv(1→basis, k, stride): channels-last single-channel
        # input path = one framed matmul
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
        h = RecurrentA(
            self.out_channels,
            self.in_channels,
            self.upsampling_depth,
            self.num_blocks,
            name="sm",
        )(h)
        h = PReLU(name="mask_act")(h)
        h = PointwiseConv(
            self.num_sources * basis, channels_last=True, name="mask_conv"
        )(h)
        # [B, T', spk·basis] → [B, T', spk, basis]; channel order (spk major)
        # matches the channels-first reshape (B, spk, basis, T')
        mask = nn.relu(h.reshape(B, -1, self.num_sources, basis))
        masked = mask * s[:, :, None, :]  # [B, T', spk, basis]
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
