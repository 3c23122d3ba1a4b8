"""Sepformer — dual-path transformer (reference: sepformer.py:578-1020).

ReLU conv encoder (no input padding) → Dual_Path_Model: gLN + 1×1 →
50%-overlap chunking (K=masknet_chunksize) → masknet_numlayers dual blocks,
each with an INDEPENDENT 8-layer intra and inter transformer (the reference
deep-copies the blocks per dual layer, sepformer.py:696) → PReLU → 1×1 to
spks → overlap-add → gated tanh·sigmoid output → 1×1 → ReLU mask →
mask × encoding → transposed-conv decoder, padded/cropped to input length.

Transformer details: pre-norm (norm_before=True in the base config),
LayerNorm eps 1e-6, fixed sinusoidal positions added to the chunk input,
and a final LayerNorm after the stack (sepformer.py:436,465).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.attention import MultiheadAttention, sinusoidal_positions
from ..ops.chunk import merge_feature, split_feature
from ..ops.conv import ConvDecoder, ConvEncoder, PointwiseConv
from ..ops.norms import GlobalLayerNorm
from ..parallel.sequence import shard_chunks
from . import register_model
from .base import BaseModel


class SBTransformerLayer(nn.Module):
    """Pre/post-norm transformer encoder layer on [B, T, d] (sepformer.py:278-365).

    Train-time dropout (reference TransformerBlock default 0.1,
    sepformer.py:507): attention weights, both residual branches
    (dropout1/dropout2, sepformer.py:355,366) and inside the FFN after the
    activation (sepformer.py:261)."""

    d_model: int
    nhead: int
    d_ffn: int
    norm_before: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        drop = lambda h: nn.Dropout(self.dropout, deterministic=not train)(h)
        src1 = nn.LayerNorm(epsilon=1e-6, name="norm1")(x) if self.norm_before else x
        attn = MultiheadAttention(
            self.d_model, self.nhead, dropout=self.dropout, name="self_att"
        )(src1, mask=mask, train=train)
        x = x + drop(attn)
        if not self.norm_before:
            x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        src1 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x) if self.norm_before else x
        ffn = nn.Dense(self.d_ffn, name="ffn1")(src1)
        ffn = nn.Dense(self.d_model, name="ffn2")(drop(nn.relu(ffn)))
        x = x + drop(ffn)
        if not self.norm_before:
            x = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x


class SBTransformerBlock(nn.Module):
    """num_layers transformer encoder + final LayerNorm, optional positions
    and causal mask (sepformer.py:469-558).

    Note: a stack-resident Pallas megakernel (all 8 layers on VMEM-resident
    activations) was built and measured SLOWER than this XLA lowering +
    the per-MHA fused attention kernel — with dh=32 the per-head dots are
    MXU-latency-bound, and XLA's single [B·h, K, K] batched einsum
    pipelines them better (docs/BENCHMARKS.md, Sepformer analysis)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 2048
    use_positional_encoding: bool = False
    norm_before: bool = False
    is_causal: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mask = None
        if self.is_causal:
            T = x.shape[1]
            mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        if self.use_positional_encoding:
            x = x + sinusoidal_positions(x.shape[1], self.d_model, x.dtype)[None]
        for i in range(self.num_layers):
            x = SBTransformerLayer(
                self.d_model,
                self.nhead,
                self.d_ffn,
                norm_before=self.norm_before,
                dropout=self.dropout,
                name=f"layer_{i}",
            )(x, mask=mask, train=train)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class DualComputationBlock(nn.Module):
    """Intra/inter transformer passes with gLN + residual (sepformer.py:578-642)."""

    out_channels: int
    intra_kwargs: dict
    inter_kwargs: dict

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, N, K, S]
        B, N, K, S = x.shape
        intra = jnp.transpose(x, (0, 3, 2, 1)).reshape(B * S, K, N)
        intra = SBTransformerBlock(**self.intra_kwargs, name="intra_mdl")(
            intra, train=train
        )
        intra = jnp.transpose(intra.reshape(B, S, K, N), (0, 3, 2, 1))
        intra = GlobalLayerNorm(N, eps=1e-8, name="intra_norm")(intra)
        intra = intra + x

        inter = jnp.transpose(intra, (0, 2, 3, 1)).reshape(B * K, S, N)
        inter = SBTransformerBlock(**self.inter_kwargs, name="inter_mdl")(
            inter, train=train
        )
        inter = jnp.transpose(inter.reshape(B, K, S, N), (0, 3, 1, 2))
        inter = GlobalLayerNorm(N, eps=1e-8, name="inter_norm")(inter)
        return inter + intra


@register_model
class Sepformer(BaseModel):
    encoder_kernel_size: int = 16
    encoder_in_nchannels: int = 1
    encoder_out_nchannels: int = 256
    masknet_chunksize: int = 250
    masknet_numlayers: int = 2
    masknet_norm: str = "gLN"
    masknet_numspks: int = 2
    intra_numlayers: int = 8
    inter_numlayers: int = 8
    intra_nhead: int = 8
    inter_nhead: int = 8
    intra_dffn: int = 1024
    inter_dffn: int = 1024
    intra_use_positional: bool = True
    inter_use_positional: bool = True
    intra_norm_before: bool = True
    inter_norm_before: bool = True
    intra_causal: bool = False
    inter_causal: bool = False
    dropout: float = 0.1  # reference TransformerBlock default (sepformer.py:507)
    sample_rate: int = 8000

    @nn.compact
    def __call__(self, mix, train: bool = False):
        was_one_d = mix.ndim == 1
        if mix.ndim == 1:
            mix = mix[None]
        elif mix.ndim == 3:
            mix = mix[:, 0]
        B, T_origin = mix.shape
        N = self.encoder_out_nchannels
        k = self.encoder_kernel_size

        mix_w = nn.relu(
            ConvEncoder(N, k, k // 2, name="encoder")(mix)
        )  # [B, N, L]
        L = mix_w.shape[-1]

        # masknet
        h = GlobalLayerNorm(N, eps=1e-8, name="mask_norm")(mix_w)
        h = PointwiseConv(N, use_bias=False, name="mask_conv1d")(h)
        chunks, gap = split_feature(h, self.masknet_chunksize)  # [B, N, K, S]
        # sequence parallelism: chunk-index axis S onto the sp mesh axis
        chunks = shard_chunks(chunks)

        intra_kwargs = dict(
            num_layers=self.intra_numlayers,
            d_model=N,
            nhead=self.intra_nhead,
            d_ffn=self.intra_dffn,
            use_positional_encoding=self.intra_use_positional,
            norm_before=self.intra_norm_before,
            is_causal=self.intra_causal,
            dropout=self.dropout,
        )
        inter_kwargs = dict(
            num_layers=self.inter_numlayers,
            d_model=N,
            nhead=self.inter_nhead,
            d_ffn=self.inter_dffn,
            use_positional_encoding=self.inter_use_positional,
            norm_before=self.inter_norm_before,
            is_causal=self.inter_causal,
            dropout=self.dropout,
        )
        x = chunks
        for i in range(self.masknet_numlayers):
            # independent params per dual layer (reference deepcopy semantics)
            x = DualComputationBlock(
                N, intra_kwargs, inter_kwargs, name=f"dual_mdl_{i}"
            )(x, train=train)
        x = PReLU(name="mask_prelu")(x)

        # 1×1 conv2d to spks: channel matmul on [B, N, K, S]
        w = self.param("conv2d_kernel", nn.initializers.lecun_normal(), (N, N * self.masknet_numspks))
        b = self.param("conv2d_bias", nn.initializers.zeros, (N * self.masknet_numspks,))
        x = jnp.einsum("bnks,nm->bmks", x, w) + b[None, :, None, None]
        K = self.masknet_chunksize
        x = x.reshape(B * self.masknet_numspks, N, K, -1)
        x = merge_feature(x, gap)  # [B*spks, N, L]

        gated = jnp.tanh(PointwiseConv(N, name="output")(x)) * nn.sigmoid(
            PointwiseConv(N, name="output_gate")(x)
        )
        x = PointwiseConv(N, use_bias=False, name="end_conv1x1")(gated)
        est_mask = nn.relu(x.reshape(B, self.masknet_numspks, N, L))

        sep_h = mix_w[:, None] * est_mask  # [B, spks, N, L]
        est = ConvDecoder(N, k, k // 2, name="decoder")(
            sep_h.reshape(B * self.masknet_numspks, N, L)
        ).reshape(B, self.masknet_numspks, -1)

        T_est = est.shape[-1]
        if T_origin > T_est:
            est = jnp.pad(est, ((0, 0), (0, 0), (0, T_origin - T_est)))
        else:
            est = est[:, :, :T_origin]
        return est[0] if was_one_d else est
