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

from ..ops.norms import GlobalLayerNorm
from ..ops.rnn import BiLSTM, LSTM
from ..ops.stft import hann_window, istft, stft
from ..parallel.sequence import current_mesh_axes, shard_chunks
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
        # Band-axis sequence parallelism (parallel/sequence.py): the band
        # axis is BSRNN's analog of the dual-path chunk axis — the per-band
        # time RNNs are embarrassingly parallel over bands, while the
        # band-comm RNN below needs the full band sequence.  Under a mesh
        # carrying ``sp`` the per-band pass runs band-MAJOR so the sharded
        # band axis survives the [nband·B, N, T] flatten (XLA propagates
        # shardings through a merge only when the sharded dim is the major
        # one) and XLA inserts the gather around the band-comm pass on its
        # own.  Off-mesh this branch is statically dead: the compiled
        # single-chip program is byte-identical to the reference layout.
        band_sharded = "sp" in current_mesh_axes()
        if band_sharded:
            h = x.reshape(B, self.nband, N, T)
            h = shard_chunks(h, chunk_axis=1)
            h = jnp.swapaxes(h, 0, 1).reshape(self.nband * B, N, T)
        else:
            h = x.reshape(B * self.nband, N, T)
        for i in range(self.num_layer):
            h = ResRNN(N, N * 2, dropout=self.dropout, name=f"band_rnn_{i}")(h, train)
        if band_sharded:
            h = jnp.swapaxes(h.reshape(self.nband, B, N, T), 0, 1)
            h = shard_chunks(h, chunk_axis=1)
        else:
            h = h.reshape(B, self.nband, N, T)
        # band comm: sequences along the band axis, batched over B*T
        h = jnp.transpose(h, (0, 3, 2, 1)).reshape(B * T, N, self.nband)
        h = ResRNN(
            N, N * 2, bidirectional=self.bi_comm, dropout=self.dropout,
            name="band_comm",
        )(h, train)
        h = jnp.transpose(h.reshape(B, T, N, self.nband), (0, 3, 2, 1))
        return h.reshape(B, self.nband * N, T)


class _PWParams(nn.Module):
    """Declares PointwiseConv-compatible params without applying them —
    used to keep per-band param pytrees while computing band-batched."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_ch, self.out_ch)
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return k, b


class _GLNParams(nn.Module):
    """GlobalLayerNorm-compatible param declaration."""

    channels: int

    @nn.compact
    def __call__(self):
        g = self.param("gamma", nn.initializers.ones, (self.channels,))
        b = self.param("beta", nn.initializers.zeros, (self.channels,))
        return g, b


class _PReLUParams(nn.Module):
    """PReLU-compatible param declaration (scalar slope, init 0.25)."""

    @nn.compact
    def __call__(self):
        return self.param(
            "alpha", lambda key, shape: jnp.full(shape, 0.25, jnp.float32), (1,)
        )


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
        bw_max = max(band_width)
        N = self.feature_dim
        window = hann_window(self.win, x.dtype)

        spec = stft(x, self.win, self.stride, window)  # [B, F, T] complex
        T = spec.shape[-1]
        B = Bsz * nch

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

        # ---- band-batched bottleneck --------------------------------------
        # The reference runs nband tiny per-band norms+convs in a Python loop
        # (bsrnn.py:126-130,199-202); here bands are zero-padded to bw_max
        # and stacked so the whole bottleneck is ONE masked norm + ONE einsum
        # on the MXU.  Per-band params keep their own pytree entries (same
        # names/shapes as a per-band loop), padded/stacked at trace time.
        subs, ctxs = [], []
        idx = 0
        for i, bwi in enumerate(band_width):
            pad_f = bw_max - bwi
            subs.append(
                jnp.pad(spec_ri[:, :, idx : idx + bwi], ((0, 0), (0, 0), (0, pad_f), (0, 0)))
            )
            ctxs.append(
                jnp.pad(
                    mixture_context[:, :, idx : idx + bwi],
                    ((0, 0), (0, 0), (0, pad_f), (0, 0)),
                )
            )
            idx += bwi
        sub_stack = jnp.stack(subs, axis=1)  # [B, nband, 2, bw_max, T]
        ctx_stack = jnp.stack(ctxs, axis=1)  # [B, nband, K, bw_max, T] complex
        # the STFT forces f32; the separator body follows the INPUT dtype
        # policy (bf16 scans are ~4× faster than f32 on v5e — the mask is
        # applied to the f32 spectrogram below, so only the mask itself is
        # computed at reduced precision)
        flat = sub_stack.reshape(B, nband, 2 * bw_max, T).astype(in_dtype)

        # per-band params, padded into stacked tensors ((2, bwi) → (2, bw_max)
        # row layout matches the reference's reshape(B, 2*bwi, T))
        def _pad_rows(p, bwi):  # [2*bwi, ...] → [2*bw_max, ...]
            p = p.reshape((2, bwi) + p.shape[1:])
            p = jnp.pad(p, ((0, 0), (0, bw_max - bwi)) + ((0, 0),) * (p.ndim - 2))
            return p.reshape((2 * bw_max,) + p.shape[2:])

        gammas, betas, kerns, biases = [], [], [], []
        for i, bwi in enumerate(band_width):
            g, b = _GLNParams(bwi * 2, name=f"bn_norm_{i}")()
            k, kb = _PWParams(bwi * 2, N, name=f"bn_conv_{i}")()
            gammas.append(_pad_rows(g, bwi))
            betas.append(_pad_rows(b, bwi))
            kerns.append(_pad_rows(k, bwi))
            biases.append(kb)
        gamma = jnp.stack(gammas)  # [nband, 2*bw_max]
        beta = jnp.stack(betas)
        kern = jnp.stack(kerns)  # [nband, 2*bw_max, N]
        bias = jnp.stack(biases)  # [nband, N]

        # masked gLN stats: padded entries are zero, so sums are exact;
        # divide by the true per-band element count
        cnt = jnp.asarray(
            np.asarray(band_width, np.float32) * 2 * T, jnp.float32
        )  # [nband]
        f32 = flat.astype(jnp.float32)
        s1 = jnp.sum(f32, axis=(2, 3))  # [B, nband]
        s2 = jnp.sum(jnp.square(f32), axis=(2, 3))
        mean = s1 / cnt
        var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
        norm = (f32 - mean[..., None, None]) / jnp.sqrt(var + _F32_EPS)[..., None, None]
        norm = norm.astype(flat.dtype)
        # padded gamma rows are zero ⇒ padded rows of h are exactly zero
        h = norm * gamma[None, :, :, None].astype(flat.dtype)
        h = h + beta[None, :, :, None].astype(flat.dtype)
        sep = jnp.einsum(
            "bkct,kcn->bknt", h, kern.astype(h.dtype),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype) + bias[None, :, :, None].astype(h.dtype)
        sep = sep.reshape(B, nband * N, T)

        for r in range(self.num_repeat):
            sep = BSNet(
                nband,
                self.feature_dim,
                self.num_layer,
                self.bi_comm,
                dropout=self.dropout,
                name=f"separator_{r}",
            )(sep, train)
        sep = sep.reshape(B, nband, N, T)

        # ---- band-batched gated complex mask heads ------------------------
        # Reference: 4 tiny convs per band in a loop (bsrnn.py:176-196).
        # c1/c2 are width-uniform → plain stacked einsums; c3/c4 pad the
        # ragged band dims, with c4's columns scattered into the padded
        # (2, 2, spk, ratio, bw_max) layout so the complex-mask math below
        # stays fully batched.  Padded positions come out exactly zero.
        spk = self.num_spks
        d3s = [bwi * ratio * 4 for bwi in band_width]
        d3max = bw_max * ratio * 4
        d4max = 2 * 2 * spk * ratio * bw_max
        mg, mb, k1s, b1s, k2s, b2s, k3s, b3s, a3s, k4s, b4s = (
            [], [], [], [], [], [], [], [], [], [], [],
        )
        for i, bwi in enumerate(band_width):
            g, b = _GLNParams(N, name=f"mask_norm_{i}")()
            mg.append(g)
            mb.append(b)
            k1, b1 = _PWParams(N, N * 4, name=f"mask_c1_{i}")()
            k1s.append(k1)
            b1s.append(b1)
            k2, b2 = _PWParams(N * 4, N * 4, name=f"mask_c2_{i}")()
            k2s.append(k2)
            b2s.append(b2)
            k3, b3 = _PWParams(N * 4, d3s[i], name=f"mask_c3_{i}")()
            k3s.append(jnp.pad(k3, ((0, 0), (0, d3max - d3s[i]))))
            b3s.append(jnp.pad(b3, ((0, d3max - d3s[i]),)))
            a3s.append(_PReLUParams(name=f"mask_act_{i}")()[0])
            k4, b4 = _PWParams(d3s[i], 2 * 2 * spk * ratio * bwi, name=f"mask_c4_{i}")()
            # scatter the true (2,2,spk,ratio,bwi) output layout into the
            # padded (2,2,spk,ratio,bw_max) layout; zero padded rows/cols
            k4 = k4.reshape(d3s[i], 2, 2, spk, ratio, bwi)
            k4 = jnp.pad(
                k4,
                ((0, d3max - d3s[i]), (0, 0), (0, 0), (0, 0), (0, 0), (0, bw_max - bwi)),
            ).reshape(d3max, d4max)
            k4s.append(k4)
            b4 = b4.reshape(2, 2, spk, ratio, bwi)
            b4 = jnp.pad(
                b4, ((0, 0), (0, 0), (0, 0), (0, 0), (0, bw_max - bwi))
            ).reshape(d4max)
            b4s.append(b4)

        hm = sep.astype(jnp.float32)
        mean = jnp.mean(hm, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(hm - mean), axis=(2, 3), keepdims=True)
        hm = ((hm - mean) / jnp.sqrt(var + _F32_EPS)).astype(sep.dtype)
        hm = hm * jnp.stack(mg)[None, :, :, None].astype(hm.dtype)
        hm = hm + jnp.stack(mb)[None, :, :, None].astype(hm.dtype)

        def _bconv(h, ks, bs):  # [B,k,c,T] × [k,c,d] → [B,k,d,T]
            y = jnp.einsum(
                "bkct,kcd->bkdt", h, jnp.stack(ks).astype(h.dtype),
                preferred_element_type=jnp.float32,
            ).astype(h.dtype)
            return y + jnp.stack(bs)[None, :, :, None].astype(h.dtype)

        hm = jnp.tanh(_bconv(hm, k1s, b1s))
        hm = jnp.tanh(_bconv(hm, k2s, b2s))
        h3 = _bconv(hm, k3s, b3s)
        alpha = jnp.stack(a3s)[None, :, None, None].astype(h3.dtype)  # [1,k,1,1]
        h3 = jnp.where(h3 >= 0, h3, alpha * h3)
        h4 = _bconv(h3, k4s, b4s)  # [B, nband, d4max, T]
        h4 = h4.reshape(B, nband, 2, 2, spk, ratio, bw_max, T)
        mask = h4[:, :, 0] * jax.nn.sigmoid(h4[:, :, 1])
        m_re, m_im = mask[:, :, 0], mask[:, :, 1]  # [B, nband, spk, K, bw_max, T]
        ctx_re = ctx_stack.real[:, :, None]  # [B, nband, 1, K, bw_max, T]
        ctx_im = ctx_stack.imag[:, :, None]
        est_re = jnp.mean(ctx_re * m_re, axis=3) - jnp.mean(ctx_im * m_im, axis=3)
        est_im = jnp.mean(ctx_re * m_im, axis=3) + jnp.mean(ctx_im * m_re, axis=3)
        est = est_re + 1j * est_im  # [B, nband, spk, bw_max, T]

        est_bands = []
        for i, bwi in enumerate(band_width):
            est_bands.append(est[:, i, :, :bwi])
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
