"""TasNet shell with pluggable separators (reference: gc3_network.py:7-188).

module ∈ {DPRNN, DPTNet, TCN, GC_TCN, SudoRMRF, GC_SudoRMRF}; GroupComm
(group_size > 1) adds GC_RNN context squeeze/decode around the separator;
``unfold`` shares separator weights across layers.

Forward spine (gc3_network.py:133-184): pad → conv encoder → gLN+1×1
bottleneck → [context squeeze] → separator → [context decode] → 1×1+ReLU
mask → mask×encoding → transposed-conv decoder → crop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.chunk import merge_feature, split_feature
from ..parallel.sequence import shard_chunks
from ..ops.conv import ConvDecoder, ConvEncoder, PointwiseConv
from ..ops.norms import GlobalLayerNorm
from . import register_model
from .base import BaseModel, normalize_input, restore_output
from .blocks import (
    DPRNNCore,
    DPTNetCore,
    GC_RNN,
    GC_TCN,
    GC_UConvBlock,
    TCN,
    UConvBlock,
)

_F32_EPS = float(np.finfo(np.float32).eps)


@register_model
class TasNet(BaseModel):
    enc_dim: int = 64
    bn_dim: int = 64
    hidden_dim: int = 128
    win: int = 16
    layer: int = 6
    num_spk: int = 2
    module: str = "DPRNN"
    context_size: int = 24
    group_size: int = 1
    block_size: int = 100
    sample_rate: int = 16000
    unfold: bool = False

    def _pad_input(self, x):
        """Zero-pad to window/stride alignment (gc3_network.py:108-131)."""
        stride = self.win // 2
        B, T = x.shape
        rest = self.win - (stride + T % self.win) % self.win
        if rest > 0:
            x = jnp.pad(x, ((0, 0), (0, rest)))
        x = jnp.pad(x, ((0, 0), (stride, stride)))
        return x, rest

    @nn.compact
    def __call__(self, wav, train: bool = False):  # train: API uniformity; reference applies no dropout here
        assert self.module in (
            "DPRNN",
            "DPTNet",
            "TCN",
            "SudoRMRF",
            "GC_TCN",
            "GC_SudoRMRF",
        )
        x, was_one_d = normalize_input(wav)
        stride = self.win // 2
        padded, rest = self._pad_input(x)
        B = padded.shape[0]

        enc_out = ConvEncoder(self.enc_dim, self.win, stride, name="encoder")(padded)
        seq_len = enc_out.shape[-1]
        feat = GlobalLayerNorm(self.enc_dim, eps=_F32_EPS, name="bn_norm")(enc_out)
        feat = PointwiseConv(self.bn_dim, use_bias=False, name="bn_conv")(feat)

        # context squeeze (GroupComm): per-window GC_RNN + mean pooling
        if self.group_size > 1:
            sq_blocks, sq_rest = split_feature(feat, self.context_size)
            # [B, bn, ctx, L] → [B*L, bn, ctx]
            L = sq_blocks.shape[-1]
            sq_in = jnp.transpose(sq_blocks, (0, 3, 1, 2)).reshape(
                B * L, self.bn_dim, self.context_size
            )
            sq_out = GC_RNN(
                self.bn_dim,
                self.hidden_dim,
                num_group=self.group_size,
                num_layers=2,
                bidirectional=True,
                name="context_enc",
            )(sq_in)
            squeeze_mean = jnp.swapaxes(
                jnp.mean(sq_out, axis=2).reshape(B, L, self.bn_dim), 1, 2
            )  # [B, bn, L]
            frames = L
        else:
            squeeze_mean = feat
            frames = feat.shape[-1]

        # separator
        if self.module in ("DPRNN", "DPTNet"):
            blocks, blk_rest = split_feature(squeeze_mean, self.block_size)
            # sequence parallelism: chunk-index axis S onto the sp mesh axis
            # (no-op off-mesh; see parallel/sequence.py)
            blocks = shard_chunks(blocks)
            core_cls = DPRNNCore if self.module == "DPRNN" else DPTNetCore
            kwargs = dict(
                input_size=self.bn_dim,
                hidden_size=self.hidden_dim,
                output_size=self.bn_dim,  # num_spk folded at the mask head
                num_group=self.group_size,
                num_layers=self.layer,
                unfold=self.unfold,
            )
            core_out = core_cls(**kwargs, name="seq_model")(blocks)
            core_out = shard_chunks(core_out)
            # [B, 1, bn, K, S] → merge overlap-add → [B, bn, L]
            core_out = core_out.reshape(B, self.bn_dim, self.block_size, -1)
            feature_map = merge_feature(core_out, blk_rest)
        elif self.module in ("TCN", "GC_TCN"):
            if self.module == "TCN":
                feature_map = TCN(
                    input_dim=self.bn_dim,
                    output_dim=self.bn_dim,
                    BN_dim=self.hidden_dim,
                    hidden_dim=self.bn_dim * 4,
                    layer=self.layer,
                    stack=2,
                    kernel=3,
                    name="seq_model",
                )(squeeze_mean)
            else:
                feature_map = GC_TCN(
                    input_dim=self.bn_dim,
                    output_dim=self.bn_dim,
                    hidden_dim=self.bn_dim * 4,
                    layer=self.layer,
                    stack=2,
                    kernel=3,
                    num_group=self.group_size,
                    name="seq_model",
                )(squeeze_mean)
        else:  # SudoRMRF family
            block_cls = GC_UConvBlock if self.module == "GC_SudoRMRF" else UConvBlock
            feature_map = squeeze_mean
            for i in range(self.layer):
                kw = dict(
                    out_channels=self.bn_dim,
                    in_channels=self.hidden_dim * 2,
                    upsampling_depth=5,
                )
                if self.module == "GC_SudoRMRF":
                    kw["num_group"] = self.group_size
                feature_map = block_cls(**kw, name=f"seq_model_{i}")(feature_map)

        feature_map = feature_map.reshape(B, -1, frames)

        # context decode
        if self.group_size > 1:
            fm = feature_map[:, :, None, :] + sq_blocks  # [B, bn, ctx, L]
            fm = jnp.transpose(fm, (0, 3, 1, 2)).reshape(
                B * frames, self.bn_dim, self.context_size
            )
            dec = GC_RNN(
                self.bn_dim,
                self.hidden_dim,
                num_group=self.group_size,
                num_layers=2,
                bidirectional=True,
                name="context_dec",
            )(fm).reshape(B, frames, self.bn_dim, -1)
            dec = jnp.transpose(dec, (0, 2, 3, 1))  # [B, bn, ctx, L]
            unsq = merge_feature(dec, sq_rest)  # [B, bn, T']
        else:
            unsq = feature_map

        # mask head (per group): 1×1 conv + ReLU
        G = self.group_size
        unsq = unsq.reshape(B * G, self.bn_dim // G, unsq.shape[-1])
        mask = nn.relu(
            PointwiseConv(self.enc_dim * self.num_spk // G, name="mask_conv")(unsq)
        )
        mask = mask.reshape(B, G, self.num_spk, self.enc_dim // G, -1)
        mask = jnp.swapaxes(mask, 1, 2).reshape(B, self.num_spk, self.enc_dim, -1)
        masked = mask * enc_out[:, None]  # [B, spk, enc, T']

        # decoder
        dec_in = masked.reshape(B * self.num_spk, self.enc_dim, seq_len)
        out = ConvDecoder(self.enc_dim, self.win, stride, name="decoder")(dec_in)
        out = out[:, stride : out.shape[-1] - (rest + stride)]
        out = out.reshape(B, self.num_spk, -1)
        return restore_output(out, was_one_d)
