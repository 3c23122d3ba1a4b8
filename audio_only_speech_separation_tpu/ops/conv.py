"""Filterbank encoder/decoder and conv wrappers, TPU-first.

The reference uses ``nn.Conv1d(1, N, win, stride=win//2, bias=False)`` as a
learned analysis filterbank and ``nn.ConvTranspose1d(N, 1, win, stride)`` as
the synthesis filterbank (reference: gc3_network.py:49,105;
convtasnet.py:119-145).  A length-`win` conv over a 1-channel signal is just
a framed matmul — we implement it that way so the FLOPs land on the MXU as a
single large [B*n_frames, win] @ [win, N] product instead of a conv with a
tiny spatial kernel.

``frame_signal``/``overlap_add`` use only reshapes/slices when
``win % stride == 0`` (true for every reference config) so XLA lowers them to
layout ops; a gather fallback covers the general case.

Channel-domain convs (1×1, dilated depthwise TCN) wrap ``jax.lax`` convs via
a torch-layout-compatible ``Conv1d`` module operating on [B, C, T].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def frame_signal(x: jnp.ndarray, win: int, stride: int) -> jnp.ndarray:
    """x: [B, T] → frames [B, n_frames, win], n = (T - win)//stride + 1."""
    B, T = x.shape
    n = (T - win) // stride + 1
    if win % stride == 0:
        r = win // stride
        # cover exactly the samples the n frames touch
        usable = (n - 1 + r) * stride
        chunks = x[:, :usable].reshape(B, -1, stride)  # [B, n-1+r, stride]
        parts = [chunks[:, j : j + n] for j in range(r)]  # r × [B, n, stride]
        return jnp.concatenate(parts, axis=2)  # [B, n, win]
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(win)[None, :]
    return x[:, idx]


def overlap_add(frames: jnp.ndarray, stride: int) -> jnp.ndarray:
    """frames: [B, n, win] → signal [B, (n-1)*stride + win] by overlap-add."""
    B, n, win = frames.shape
    T = (n - 1) * stride + win
    if win % stride == 0:
        r = win // stride
        out = jnp.zeros((B, n - 1 + r, stride), frames.dtype)
        chunks = frames.reshape(B, n, r, stride)
        for j in range(r):
            out = out.at[:, j : j + n].add(chunks[:, :, j])
        return out.reshape(B, -1)[:, :T]
    out = jnp.zeros((B, T), frames.dtype)
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(win)[None, :]
    return out.at[:, idx].add(frames)


class ConvEncoder(nn.Module):
    """Learned analysis filterbank: [B, T] → [B, N, n_frames].

    Torch-equivalent: Conv1d(1, N, win, stride, bias=False) with
    xavier-uniform init (reference gc3_network.py:49-50).
    """

    out_channels: int
    win: int
    stride: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):  # [B, T]
        w = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (self.win, self.out_channels),
        )
        frames = frame_signal(x, self.win, self.stride)  # [B, n, win]
        y = jnp.einsum(
            "bnw,wc->bnc", frames, w.astype(frames.dtype),
            preferred_element_type=jnp.float32,
        ).astype(frames.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b
        return jnp.swapaxes(y, 1, 2)  # [B, N, n]


class ConvDecoder(nn.Module):
    """Learned synthesis filterbank: [B, N, n_frames] → [B, T].

    Torch-equivalent: ConvTranspose1d(N, 1, win, stride, bias=False)
    (reference gc3_network.py:105-106).
    """

    in_channels: int
    win: int
    stride: int

    @nn.compact
    def __call__(self, x):  # [B, N, n]
        w = self.param(
            "kernel",
            nn.initializers.xavier_uniform(),
            (self.in_channels, self.win),
        )
        frames = jnp.einsum(
            "bcn,cw->bnw", x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)  # [B, n, win]
        return overlap_add(frames, self.stride)


class Conv1d(nn.Module):
    """Torch-layout Conv1d on [B, C, T] with explicit symmetric padding.

    Supports dilation and grouped/depthwise convs; weight layout is the flax
    [receptive, in_per_group, out] convention internally, exposed only through
    this module.  ``padding`` is an int (zeros both sides), matching how the
    reference's TCN computes its own padding (reference tcn.py:6-37).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, C, T]
        y = jnp.swapaxes(x, 1, 2)  # [B, T, C]
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
        )(y)
        return jnp.swapaxes(y, 1, 2)


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d on [B, C, T].

    out[b, o, i*stride + j] += Σ_c x[b, c, i] · w[c, o, j] — implemented as
    one channel-mixing einsum (MXU) + overlap-add (layout ops), with the
    kernel stored in the torch [in, out, k] layout so reference weights
    import verbatim.  (flax's nn.ConvTranspose uses a different kernel
    convention — fractionally-strided conv without the flip — which does
    NOT match torch; see tests/test_torch_parity.py.)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, C, T]
        B, C, T = x.shape
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (C, self.out_channels, self.kernel_size),
        )
        frames = jnp.einsum(
            "bct,cok->botk", x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)  # [B, out, T, k]
        out = overlap_add(
            frames.reshape(B * self.out_channels, T, self.kernel_size), self.stride
        ).reshape(B, self.out_channels, -1)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + b[None, :, None]
        return out


class PointwiseConv(nn.Module):
    """1×1 conv on [B, C, T] — a channel matmul, straight to the MXU."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):  # [B, C, T]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[1], self.out_channels),
        )
        y = jnp.einsum(
            "bct,cd->bdt", x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None]
        return y
