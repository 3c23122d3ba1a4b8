"""Sandglasset (reference: look2hear/models/sandglasset.py:262-434).

Alternating local BiLSTM + downsampled global self-attention whose rate
shrinks then grows (4^i then mirrored — the "sandglass"), with skip
connections across mirrored blocks.  Signal is peak-normalized and scaled by
−5 dB at the input (sandglasset.py:330,363-368).

Chunking here uses the unfold/fold variant with a FULL extra block of
padding on both sides and a /2 overlap correction (sandglasset.py:383-413),
unlike the other dual-path models.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.activations import PReLU
from ..ops.attention import MultiheadAttention, sinusoidal_positions
from ..ops.conv import (
    ConvEncoder,
    PointwiseConv,
    frame_axis1,
    frame_signal,
    overlap_add,
    overlap_add_axis1,
)
from ..ops.norms import GlobalLayerNorm
from ..ops.resample import _linear_interp_matrix
from ..ops.rnn import BiLSTM, _DenseParams
from . import register_model
from .base import BaseModel


def unfold_chunks(x: jnp.ndarray, K: int):
    """x: [B, D, I] → channels-last chunks [B, S, K, D] with padding=K on
    both sides, stride K/2 (torch unfold semantics, sandglasset.py:383-395)."""
    B, D, I = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (K, K)))
    frames = frame_signal(xp.reshape(B * D, -1), K, K // 2)  # [B*D, S, K]
    S = frames.shape[1]
    return jnp.transpose(frames.reshape(B, D, S, K), (0, 2, 3, 1)), I


def fold_chunks(chunks: jnp.ndarray, ori_len: int):
    """Inverse of `unfold_chunks` ([B, S, K, D] channels-last in) with the
    reference's /2 normalization; returns [B, D, ori_len]."""
    B, S, K, D = chunks.shape
    frames = jnp.transpose(chunks, (0, 3, 1, 2)).reshape(B * D, S, K)
    sig = overlap_add(frames, K // 2)  # [B*D, T_pad]
    sig = sig[:, K : K + ori_len] / 2.0
    return sig.reshape(B, D, ori_len)


class GlobalAttnLayer(nn.Module):
    """MHA + (output + dropout(output)) + LayerNorm (sandglasset.py:52-72)."""

    channels: int
    n_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, S, D]
        out = MultiheadAttention(
            self.channels, self.n_head, dropout=self.dropout, name="attn"
        )(x, train=train)
        # reference quirk: residual adds dropout(output) to output, not input
        res = nn.Dropout(self.dropout, deterministic=not train)(out) \
            if self.dropout > 0.0 else out
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out + res)


class SandglassetBlock(nn.Module):
    """Intra BiLSTM + downsampled inter attention (sandglasset.py:135-206)."""

    in_chan: int
    hid_size: int
    n_head: int = 8
    block_i: int = 2
    model_n_block: int = 6
    chunk_size: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, skip_connect=None, train: bool = False):
        # Channels-last execution on [B, S, K, D]: the intra scan consumes
        # its layout directly (zero transposes), pooling is a reshape-mean
        # on axis 2, and the upsample einsum absorbs the Q→K interpolation
        # AND the transpose back — the naive [B,D,K,S] form moved this
        # 67 MB tensor 6 times per block.  Params/math unchanged.
        B, S, K, D = x.shape
        # intra-chunk BiLSTM with the output projection fused into the scan
        pk, pb = _DenseParams(D, 2 * self.hid_size, name="intra_linear")()
        local = BiLSTM(self.hid_size, name="intra_rnn")(
            x.reshape(B * S, K, D), pk, pb
        )
        local = GlobalLayerNorm(D, eps=1e-5, channels_last=True, name="intra_norm")(
            local.reshape(B, S, K, D)
        )
        x = x + local

        # inter-chunk attention at a downsampled rate
        if self.block_i < self.model_n_block // 2:
            kernel = 4**self.block_i
        else:
            kernel = 4 ** (self.model_n_block - self.block_i - 1)
        if kernel == 1:
            # identity pooling (blocks 0 and n-1): stay in [B, S, K, D] and
            # attend over S with K batched — the 4-D MHA path absorbs both
            # layout changes into the projection matmuls, so the 67 MB
            # block tensor never goes through a standalone transpose
            g = x
            if skip_connect is not None:
                g = g + skip_connect
            h = nn.LayerNorm(epsilon=1e-5, name="attn_in_norm")(g)
            h = h + sinusoidal_positions(S, D, h.dtype)[None, :, None, :]
            h = GlobalAttnLayer(
                D, self.n_head, dropout=self.dropout, name="attn_layer"
            )(h, train=train)
            up = GlobalLayerNorm(D, eps=1e-5, channels_last=True, name="inter_norm")(h)
            return x + up, h  # skip_out stays [B, S, K, D]

        Q = (K - kernel) // kernel + 1
        # pooling + the [B,S,Q,D]→[B,Q,S,D] layout change as ONE einsum
        # against a static averaging matrix — the slice/reshape/mean/
        # transpose chain this replaces materialized the 67 MB block
        # tensor twice per pooled block (the "8 × 0.42 ms layout copies"
        # in the round-4 roofline, docs/BENCHMARKS.md Sandglasset)
        import numpy as _np

        pm = _np.zeros((K, Q), _np.float32)
        for qi in range(Q):
            pm[qi * kernel : (qi + 1) * kernel, qi] = 1.0 / kernel
        g = jnp.einsum(
            "bskd,kq->bqsd", x, jnp.asarray(pm, x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(B * Q, S, D)  # [B·Q, S, D]
        if skip_connect is not None:
            g = g + skip_connect
        h = nn.LayerNorm(epsilon=1e-5, name="attn_in_norm")(g)
        h = h + sinusoidal_positions(S, D, h.dtype)[None, :, :]
        h = GlobalAttnLayer(D, self.n_head, dropout=self.dropout, name="attn_layer")(
            h, train=train
        )
        skip_out = h  # [B·Q, S, D]

        # [B·Q, S, D] → upsample along Q → [B, S, K, D]
        up4 = h.reshape(B, Q, S, D)
        if Q == self.chunk_size:
            up = jnp.transpose(up4, (0, 2, 1, 3))
        else:
            # linear/align_corners interpolation as a matmul that also
            # emits the [B, S, K, D] layout directly
            m = jnp.asarray(_linear_interp_matrix(Q, self.chunk_size), up4.dtype)
            up = jnp.einsum("bqsd,qk->bskd", up4, m)
        up = GlobalLayerNorm(D, eps=1e-5, channels_last=True, name="inter_norm")(up)
        return x + up, skip_out


@register_model
class Sandglasset(BaseModel):
    n_feats: int = 64
    n_src: int = 2
    out_chan: int = 64
    bn_chan: int = 128
    hid_size: int = 128
    chunk_size: int = 250
    hop_size: int = 125
    n_repeats: int = 6
    n_head: int = 8
    norm_type: str = "gLN"
    mask_act: str = "sigmoid"
    bidirectional: bool = True
    rnn_type: str = "LSTM"
    num_layers: int = 1
    dropout: float = 0.0
    kernel_size: int = 2
    sr: int = 16000
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, train: bool = False):
        was_one_d = wav.ndim == 1
        if wav.ndim == 1:
            wav = wav[None]
        B, T = wav.shape

        # −5 dB peak normalization (sandglasset.py:363-368)
        sig = wav - jnp.sum(wav, axis=-1, keepdims=True) / T
        sig = sig / (jnp.max(jnp.abs(sig), axis=-1, keepdims=True) + 1e-12)
        sig = sig / (10 ** (5.0 / 20.0))

        win = self.kernel_size
        hop = win // 2
        rest = win - (hop + T % win) % win
        if rest > 0:
            sig = jnp.pad(sig, ((0, 0), (0, rest)))
        sig = jnp.pad(sig, ((0, 0), (hop, hop)))

        # Channels-last front end ([B, I, C] throughout — identical param
        # tree): chunking is then frame_axis1 slices instead of the 67 MB
        # [B, D, I] → [B, S, K, D] unfold transpose (round-5 perf item)
        mixture_w = nn.relu(
            ConvEncoder(
                self.n_feats, win, hop, use_bias=False, channels_last=True,
                name="encoder",
            )(sig)
        )  # [B, I, N]
        mixture_w = GlobalLayerNorm(
            self.n_feats, eps=1e-8, channels_last=True, name="enc_LN"
        )(mixture_w)
        out = PointwiseConv(
            self.bn_chan, use_bias=False, channels_last=True, name="bottleneck"
        )(mixture_w)  # [B, I, D]
        I = out.shape[1]
        ori_len = I
        K = self.chunk_size
        chunks = frame_axis1(
            jnp.pad(out, ((0, 0), (K, K), (0, 0))), K, K // 2
        )  # [B, S, K, D]
        chunks = GlobalLayerNorm(
            self.bn_chan, eps=1e-8, channels_last=True, name="seg_norm"
        )(nn.relu(chunks))

        skips = []
        x = chunks
        for i in range(self.n_repeats):
            block = SandglassetBlock(
                self.bn_chan,
                self.hid_size,
                self.n_head,
                block_i=i,
                model_n_block=self.n_repeats,
                chunk_size=self.chunk_size,
                dropout=self.dropout,
                name=f"sep_{i}",
            )
            if i < self.n_repeats // 2:
                x, skip = block(x, train=train)
                skips.append(skip)
            else:
                x, _ = block(x, skip_connect=skips.pop(), train=train)

        # mask head: PReLU → 1×1 conv2d → Softplus
        x = PReLU(name="first_out_act")(x)
        w = self.param(
            "first_out_kernel",
            nn.initializers.lecun_normal(),
            (self.bn_chan, self.n_src * self.n_feats),
        )
        b = self.param(
            "first_out_bias", nn.initializers.zeros, (self.n_src * self.n_feats,)
        )
        x = jnp.einsum("bskn,nm->bskm", x, w) + b[None, None, None, :]
        x = jax.nn.softplus(x)  # [B, S, K, n_src·n_feats]
        # channels-last fold: overlap-add over the chunk axis with the
        # feature axis trailing (no [B,S,K,M]→[B·M,S,K] transpose)
        sig_cl = overlap_add_axis1(x, K // 2)[:, K : K + ori_len] / 2.0
        est = sig_cl.reshape(B, ori_len, self.n_src, self.n_feats)
        est = jnp.swapaxes(est, 1, 2).reshape(
            B * self.n_src, ori_len, self.n_feats
        )
        est = GlobalLayerNorm(
            self.n_feats, eps=1e-8, channels_last=True, name="out_norm"
        )(nn.relu(est)).reshape(B, self.n_src, I, self.n_feats)

        masked = est * mixture_w[:, None]  # [B, C, I, N]
        # decoder: Linear(n_feats → kernel) + overlap-add (sandglasset.py:209-259)
        dw = self.param(
            "decoder_kernel", nn.initializers.lecun_normal(), (self.n_feats, win)
        )
        frames = jnp.einsum("bcin,nw->bciw", masked, dw)  # [B, C, I, win]
        Bc = B * self.n_src
        sigs = overlap_add(frames.reshape(Bc, I, win), hop).reshape(B, self.n_src, -1)
        sigs = sigs[:, :, hop : sigs.shape[-1] - (rest + hop)]
        return sigs[0] if was_one_d else sigs
