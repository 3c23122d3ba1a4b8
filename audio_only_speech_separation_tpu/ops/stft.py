"""torch.stft / torch.istft-compatible STFT in jnp.

BSRNN is an STFT-domain model (reference: look2hear/models/bsrnn.py:167-173,
223-229 — torch.stft with a hann window, center=True/reflect padding,
onesided, and torch.istft with window-square overlap normalization).  For
checkpoint-level parity the conventions here match torch exactly.

Framing reuses ``frame_signal`` (reshape-only when hop divides n_fft), and
the DFT itself is jnp.fft.rfft — XLA has a tuned TPU FFT.  For the small
n_fft=256 used by BSRNN, an alternative framed-matmul DFT
(`stft_matmul`) is provided: frames @ DFT-matrix maps onto the MXU and can
beat the generic FFT at these sizes.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .conv import frame_signal, overlap_add


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann, matching torch.hann_window(win, periodic=True)."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype)


def stft(
    x: jnp.ndarray,  # [B, T]
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,  # [n_fft]
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Returns complex spectrogram [B, n_fft//2 + 1, n_frames]."""
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)  # [B, n, n_fft]
    spec = jnp.fft.rfft(frames * window, axis=-1)  # [B, n, F]
    return jnp.swapaxes(spec, 1, 2)  # [B, F, n]


@lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Cached as NUMPY — caching jnp arrays created under a trace would
    leak tracers into later jit invocations (see ops/resample.py)."""
    k = np.arange(n_fft // 2 + 1)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = -2.0 * np.pi * k * n / n_fft
    return (
        np.asarray(np.cos(ang).T, np.float32),  # [n_fft, F]
        np.asarray(np.sin(ang).T, np.float32),
    )


def stft_matmul(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """MXU-path STFT: framed matmul against a DFT matrix.

    Returns (real, imag) each [B, F, n_frames]; numerically equals `stft`.
    """
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length) * window  # [B, n, n_fft]
    cos_m, sin_m = _dft_matrices(n_fft)
    re = jnp.einsum("bnw,wf->bfn", frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.einsum("bnw,wf->bfn", frames, sin_m, preferred_element_type=jnp.float32)
    return re, im


def istft(
    spec: jnp.ndarray,  # complex [B, F, n_frames]
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """torch.istft-compatible inverse with window-square normalization."""
    spec = jnp.swapaxes(spec, 1, 2)  # [B, n, F]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, n, n_fft]
    frames = frames * window
    sig = overlap_add(frames, hop_length)  # [B, T_pad]
    # window envelope normalization
    n = frames.shape[1]
    wsq = jnp.broadcast_to(jnp.square(window)[None, None, :], (1, n, n_fft))
    env = overlap_add(wsq, hop_length)[0]  # [T_pad]
    sig = sig / jnp.maximum(env, 1e-11)
    if center:
        p = n_fft // 2
        sig = sig[:, p:]
        if length is not None:
            sig = sig[:, :length]
        else:
            sig = sig[:, : sig.shape[1] - p]
    elif length is not None:
        sig = sig[:, :length]
    return sig
