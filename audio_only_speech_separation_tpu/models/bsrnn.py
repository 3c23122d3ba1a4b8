"""BSRNN — STFT-domain band-split RNN (reference: look2hear/models/bsrnn.py).

Hann STFT (win 256 / hop 64 @ 8 kHz) → nonuniform band partition computed
from the sample rate (bsrnn.py:93-121) → per-band gLN + 1×1 bottleneck →
num_repeat × BSNet (per-band time ResRNN + cross-band comm ResRNN) →
per-band gated complex mask MLP (± context frames) → iSTFT.

The (unused) subband_power of the reference (bsrnn.py:195) is not computed.
"""

from __future__ import annotations

from math import ceil, floor
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import PReLU
from ..ops.conv import PointwiseConv
from ..ops.norms import GlobalLayerNorm
from ..ops.rnn import BiLSTM, LSTM
from ..ops.stft import hann_window, istft, stft
from . import register_model
from .base import BaseModel

_F32_EPS = float(np.finfo(np.float32).eps)


def compute_band_widths(sample_rate: int, enc_dim: int) -> List[int]:
    """Band partition (bsrnn.py:93-121): 100 Hz bands at the bottom, then
    250/500/1k/2k, with a final remainder band."""
    half = sample_rate / 2.0
    bw: List[int] = []
    b100 = int(floor(100 / half * enc_dim))
    bw += [b100] * int(ceil(10 / 44100 * sample_rate))
    b250 = int(floor(250 / half * enc_dim))
    m = int(ceil(12 / 44100 * sample_rate))
    if sum(bw + [b250] * m) < enc_dim:
        bw += [b250] * m
    b500 = int(floor(500 / half * enc_dim))
    m = int(ceil(8 / 44100 * sample_rate))
    if sum(bw + [b500] * m) < enc_dim:
        bw += [b500] * m
    if sample_rate > 8000:
        b1k = int(floor(1000 / half * enc_dim))
        m = int(ceil(8 / 44100 * sample_rate))
        if sum(bw + [b1k] * m) < enc_dim:
            bw += [b1k] * m
    if sample_rate > 16000:
        b2k = int(floor(2000 / half * enc_dim))
        m = int(ceil(2 / 44100 * sample_rate))
        if sum(bw + [b2k] * m) < enc_dim:
            bw += [b2k] * m
    bw.append(enc_dim - sum(bw))
    assert bw[-1] > 0, f"{enc_dim}, {sum(bw)}"
    return bw


class ResRNN(nn.Module):
    """gLN → dropout → (Bi)LSTM → proj, residual (bsrnn.py:13-34).
    [B, D, T]→same.  Dropout sits between the norm and the RNN
    (bsrnn.py:31), train-time only."""

    input_size: int
    hidden_size: int
    bidirectional: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = GlobalLayerNorm(self.input_size, eps=_F32_EPS, name="norm")(x)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = jnp.swapaxes(h, 1, 2)  # [B, T, D]
        if self.bidirectional:
            h = BiLSTM(self.hidden_size, name="rnn")(h)
        else:
            h = LSTM(self.hidden_size, name="rnn")(h)
        h = nn.Dense(self.input_size, name="proj")(h)
        return x + jnp.swapaxes(h, 1, 2)


class BSNet(nn.Module):
    """Per-band time RNN + cross-band comm RNN (bsrnn.py:37-60)."""

    nband: int
    feature_dim: int
    num_layer: int = 1
    bi_comm: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, nband*N, T]
        B, _, T = x.shape
        N = self.feature_dim
        h = x.reshape(B * self.nband, N, T)
        for i in range(self.num_layer):
            h = ResRNN(N, N * 2, dropout=self.dropout, name=f"band_rnn_{i}")(h, train)
        h = h.reshape(B, self.nband, N, T)
        # band comm: sequences along the band axis, batched over B*T
        h = jnp.transpose(h, (0, 3, 2, 1)).reshape(B * T, N, self.nband)
        h = ResRNN(
            N, N * 2, bidirectional=self.bi_comm, dropout=self.dropout,
            name="band_comm",
        )(h, train)
        h = jnp.transpose(h.reshape(B, T, N, self.nband), (0, 3, 2, 1))
        return h.reshape(B, self.nband * N, T)


@register_model
class BSRNN(BaseModel):
    win: int = 256
    stride: int = 64
    feature_dim: int = 128
    num_spks: int = 2
    num_layer: int = 1
    num_repeat: int = 8
    context: int = 0
    dropout: float = 0.0
    bi_comm: bool = True
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, train: bool = False):
        input_ndim = wav.ndim
        if wav.ndim == 1:
            wav = wav[None, None, :]
        elif wav.ndim == 2:
            wav = wav[:, None, :]
        Bsz, nch, nsample = wav.shape
        in_dtype = wav.dtype
        # FFTs run in f32 regardless of compute dtype (TPU FFT has no bf16
        # path); the separator body still follows the input dtype policy
        x = wav.reshape(Bsz * nch, nsample).astype(jnp.float32)

        enc_dim = self.win // 2 + 1
        ratio = self.context * 2 + 1
        band_width = compute_band_widths(self.sample_rate, enc_dim)
        nband = len(band_width)
        window = hann_window(self.win, x.dtype)

        spec = stft(x, self.win, self.stride, window)  # [B, F, T] complex
        T = spec.shape[-1]

        # context stack [B, K, F, T] (K = ratio)
        if self.context > 0:
            ctx = []
            for i in range(self.context, 0, -1):
                ctx.append(jnp.pad(spec[:, :-i], ((0, 0), (i, 0), (0, 0))))
            ctx.append(spec)
            for i in range(1, self.context + 1):
                ctx.append(jnp.pad(spec[:, i:], ((0, 0), (0, i), (0, 0))))
            mixture_context = jnp.stack(ctx, axis=1)
        else:
            mixture_context = spec[:, None]  # [B, 1, F, T]

        spec_ri = jnp.stack([spec.real, spec.imag], axis=1)  # [B, 2, F, T]

        # per-band bottleneck
        feats = []
        sub_ctx = []
        idx = 0
        for i, bwi in enumerate(band_width):
            sub = spec_ri[:, :, idx : idx + bwi]  # [B, 2, bw, T]
            sub_ctx.append(mixture_context[:, :, idx : idx + bwi])  # [B, K, bw, T]
            flat = sub.reshape(Bsz * nch, bwi * 2, T)
            h = GlobalLayerNorm(bwi * 2, eps=_F32_EPS, name=f"bn_norm_{i}")(flat)
            h = PointwiseConv(self.feature_dim, name=f"bn_conv_{i}")(h)
            feats.append(h)
            idx += bwi
        sep = jnp.concatenate(feats, axis=1)  # [B, nband*N, T]

        for r in range(self.num_repeat):
            sep = BSNet(
                nband,
                self.feature_dim,
                self.num_layer,
                self.bi_comm,
                dropout=self.dropout,
                name=f"separator_{r}",
            )(sep, train)
        sep = sep.reshape(Bsz * nch, nband, self.feature_dim, T)

        # per-band gated complex masks
        est_bands = []
        for i, bwi in enumerate(band_width):
            h = sep[:, i]  # [B, N, T]
            h = GlobalLayerNorm(self.feature_dim, eps=_F32_EPS, name=f"mask_norm_{i}")(h)
            h = jnp.tanh(PointwiseConv(self.feature_dim * 4, name=f"mask_c1_{i}")(h))
            h = jnp.tanh(PointwiseConv(self.feature_dim * 4, name=f"mask_c2_{i}")(h))
            h = PReLU(name=f"mask_act_{i}")(
                PointwiseConv(bwi * ratio * 4, name=f"mask_c3_{i}")(h)
            )
            h = PointwiseConv(self.num_spks * bwi * ratio * 4, name=f"mask_c4_{i}")(h)
            h = h.reshape(Bsz * nch, 2, 2, self.num_spks, ratio, bwi, T)
            mask = h[:, 0] * jax.nn.sigmoid(h[:, 1])  # [B, 2, spk, K, bw, T]
            m_re, m_im = mask[:, 0], mask[:, 1]  # [B, spk, K, bw, T]
            ctx_re = sub_ctx[i].real[:, None]  # [B, 1, K, bw, T]
            ctx_im = sub_ctx[i].imag[:, None]
            est_re = jnp.mean(ctx_re * m_re, axis=2) - jnp.mean(ctx_im * m_im, axis=2)
            est_im = jnp.mean(ctx_re * m_im, axis=2) + jnp.mean(ctx_im * m_re, axis=2)
            est_bands.append(est_re + 1j * est_im)  # [B, spk, bw, T]
        est_spec = jnp.concatenate(est_bands, axis=2)  # [B, spk, F, T]

        out = istft(
            est_spec.reshape(Bsz * nch * self.num_spks, enc_dim, T),
            self.win,
            self.stride,
            window,
            length=nsample,
        )
        out = out.reshape(Bsz, nch, self.num_spks, -1).astype(in_dtype)
        if input_ndim == 1:
            return out[0, 0]
        if input_ndim == 2:
            return out[:, 0]
        return out
