"""General filterbank/STFT layer library (the reference's dormant machinery).

Re-provides `/root/reference/look2hear/layers/stft.py` — window factory
(:31-57), multi-mode DFT kernels (:61-113), mel filterbank (:116-162),
speed-perturbation resampling filter (:163-193), feature splicing
(:196-223), functional ``forward_stft``/``inverse_stft`` (:477-612) and the
``STFT``/``iSTFT`` layer classes (:613-780).  Like the reference's, this
library is exported API surface; nothing in the model zoo consumes it.

TPU-first mapping: the reference runs the DFT as a ``conv1d`` against a
[2B, 1, W] kernel (one output channel per DFT row — a batched dot in
disguise).  Here framing is an explicit ``frame_signal`` reshape and the
transform is ONE [n_frames, W] @ [W, 2B] matmul that tiles directly onto
the MXU; the inverse is the transposed matmul + ``overlap_add``.  Same
math, no im2col, static shapes throughout (jit-safe).

The mel filterbank reproduces ``librosa.filters.mel(htk=True)`` (triangle
ramps between HTK-mel band edges, optional Slaney area normalization) in
pure numpy — librosa is not a dependency.  The speed-perturb filter
reproduces the windowed-sinc polyphase bank of danpovey/filtering that the
reference vendors.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

EPSILON = float(np.finfo(np.float32).eps)

__all__ = [
    "init_window",
    "init_kernel",
    "mel_filter",
    "speed_perturb_filter",
    "splice_feature",
    "forward_stft",
    "inverse_stft",
    "STFT",
    "iSTFT",
]


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

def init_window(wnd: str, frame_len: int) -> np.ndarray:
    """Window coefficients, periodic (matching torch.*_window defaults and
    therefore librosa), except "rect".  Reference stft.py:31-57."""
    N = frame_len
    n = np.arange(N, dtype=np.float64)
    if wnd == "rect":
        w = np.ones(N)
    elif wnd in ("hann", "sqrthann"):
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / N)
        if wnd == "sqrthann":
            w = np.sqrt(w)
    elif wnd == "hamm":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / N)
    elif wnd == "blackman":
        # torch.blackman_window(periodic=True) exact coefficients
        w = 0.42 - 0.5 * np.cos(2.0 * np.pi * n / N) + 0.08 * np.cos(
            4.0 * np.pi * n / N
        )
    elif wnd == "bartlett":
        # torch.bartlett_window(periodic=True): triangle over N+1 points,
        # last dropped
        w = 1.0 - np.abs(2.0 * n / N - 1.0)
    else:
        raise RuntimeError(f"Unknown window type: {wnd}")
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# DFT kernels
# ---------------------------------------------------------------------------

def init_kernel(
    frame_len: int,
    frame_hop: int,
    window: np.ndarray,
    round_pow_of_two: bool = True,
    normalized: bool = False,
    inverse: bool = False,
    mode: str = "librosa",
) -> Tuple[np.ndarray, np.ndarray]:
    """DFT kernel matrix [2B, W] + (possibly center-padded) window [W].

    Matches reference stft.py:61-113 semantics: fft_size B rounds up to a
    power of two under ``round_pow_of_two`` (always for kaldi); librosa mode
    center-pads the window to B and frames W = B samples, kaldi mode keeps
    W = frame_len and truncates the DFT matrix rows; ``normalized`` scales
    by B^-1/2, the inverse kernel by 1/B (so K^H K = I either way).

    The reference reshapes to [2B, 1, W] for conv1d; the natural TPU form
    is the plain [2B, W] matrix (framed matmul), which is what we return.
    """
    if mode not in ("librosa", "kaldi"):
        raise ValueError(f"Unsupported mode: {mode}")
    if round_pow_of_two or mode == "kaldi":
        fft_size = 2 ** math.ceil(math.log2(frame_len))
    else:
        fft_size = frame_len
    window = np.asarray(window, np.float64)
    if mode == "librosa" and fft_size != frame_len:
        lpad = (fft_size - frame_len) // 2
        window = np.pad(window, (lpad, fft_size - frame_len - lpad))
    S = fft_size**0.5 if normalized else 1.0
    # K[w, k] = DFT of the w-th basis vector: exp(-2πi·w·k/B)
    K = np.fft.fft(np.eye(fft_size) / S, axis=-1)
    K = np.stack([K.real, K.imag], axis=-1)  # [W, B, 2]
    if mode == "kaldi":
        K = K[:frame_len]
    if inverse and not normalized:
        K = K / fft_size
    # [W, B, 2] → [2, B, W] → [2B, W]
    K = np.transpose(K, (2, 1, 0)).reshape(fft_size * 2, K.shape[0])
    return K.astype(np.float32), window.astype(np.float32)


# ---------------------------------------------------------------------------
# mel filterbank (librosa.filters.mel(htk=True) in numpy)
# ---------------------------------------------------------------------------

def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filter(
    frame_len: int,
    round_pow_of_two: bool = True,
    num_bins: Optional[int] = None,
    sr: int = 16000,
    num_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    norm: bool = False,
) -> np.ndarray:
    """Mel filterbank [num_mels, N//2 + 1] — reference stft.py:116-162.

    HTK mel scale, triangle responses between band edges, optional Slaney
    area normalization (``norm=True``); the reference's fmax clamping
    quirks (negative fmax means "below Nyquist by that much") reproduced.
    """
    if num_bins is None:
        N = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
    else:
        N = (num_bins - 1) * 2
    freq_upper = sr // 2
    if fmax is None:
        fmax = float(freq_upper)
    else:
        fmax = float(min(fmax + freq_upper if fmax < 0 else fmax, freq_upper))
    fmin = float(max(0.0, fmin))

    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + N // 2)
    mel_edges = _mel_to_hz_htk(
        np.linspace(_hz_to_mel_htk(fmin), _hz_to_mel_htk(fmax), num_mels + 2)
    )  # [num_mels + 2] band edge frequencies in Hz
    fdiff = np.diff(mel_edges)  # [num_mels + 1]
    ramps = mel_edges[:, None] - fft_freqs[None, :]  # [num_mels+2, F]
    lower = -ramps[:-2] / fdiff[:-1, None]  # rising edge of triangle m
    upper = ramps[2:] / fdiff[1:, None]  # falling edge
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm:  # Slaney: equal area per band
        enorm = 2.0 / (mel_edges[2 : num_mels + 2] - mel_edges[:num_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# speed-perturbation resampling filter
# ---------------------------------------------------------------------------

def speed_perturb_filter(
    src_sr: int, dst_sr: int, cutoff_ratio: float = 0.95, num_zeros: int = 64
) -> np.ndarray:
    """Polyphase windowed-sinc resampler bank [dst_sr, src_sr, K] for
    src_sr → dst_sr speed perturbation.

    Same filter the reference vendors from danpovey/filtering
    (stft.py:163-193): a Hann-windowed sinc low-pass at ``cutoff_ratio``
    of the narrower Nyquist, evaluated at every (output-phase,
    input-phase) fractional lag.  Numerically identical weights
    (tests/test_stft_lib.py::test_speed_perturb_matches_reference); the
    construction below is organized around the lag grid instead of the
    reference's flat index arithmetic.
    """
    if src_sr == dst_sr:
        raise ValueError(
            f"speed perturbation needs two distinct rates; got {src_sr} -> {dst_sr}"
        )
    g = math.gcd(src_sr, dst_sr)
    up, down = dst_sr // g, src_sr // g  # phases out / phases in
    if up == 1 or down == 1:
        raise ValueError(
            "integer-ratio resampling is outside the perturbation bank's domain"
        )
    # passband half-width (in input-sample units) and one-sided tap reach
    bw = cutoff_ratio * min(up, down)
    reach = 1 + int(num_zeros / bw)
    # lag[d, s] = position of output phase d/up relative to input phase
    # s/down; each tap k then sits at t = lag + (reach − k)
    lag = (
        np.arange(up, dtype=np.float64)[:, None] / up
        - np.arange(down, dtype=np.float64)[None, :] / down
    )
    t = lag[:, :, None] + (
        reach - np.arange(2 * reach + 1, dtype=np.float64)[None, None, :]
    )
    # raised-cosine window, open support (zero at |t| == reach)
    win = np.where(
        np.abs(t) < reach, 0.5 * (1.0 + np.cos(np.pi * t / reach)), 0.0
    )
    w = np.sinc(t * bw) * win * (bw / down)
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# feature splicing
# ---------------------------------------------------------------------------

def splice_feature(
    feats: jnp.ndarray, lctx: int = 1, rctx: int = 1, op: str = "cat"
) -> jnp.ndarray:
    """Splice [..., T, F] features with edge-clamped ±context frames —
    reference stft.py:196-223.  ``cat`` → [..., T, F·D]; ``stack`` →
    [..., T, F, D] with D = lctx + rctx + 1."""
    if lctx + rctx == 0:
        return feats
    if op not in ("cat", "stack"):
        raise ValueError(f"Unknown op for feature splicing: {op}")
    T = feats.shape[-2]
    ctx = []
    for c in range(-lctx, rctx + 1):
        idx = np.clip(np.arange(c, c + T), 0, T - 1)
        ctx.append(jnp.take(feats, jnp.asarray(idx), axis=-2))
    return jnp.concatenate(ctx, -1) if op == "cat" else jnp.stack(ctx, -1)


# ---------------------------------------------------------------------------
# functional STFT/iSTFT over the kernel matrices
# ---------------------------------------------------------------------------

def _frame(x: jnp.ndarray, W: int, hop: int) -> jnp.ndarray:
    """[N, S] → [N, n_frames, W] gather framing (W need not divide by hop)."""
    n = (x.shape[-1] - W) // hop + 1
    idx = np.arange(W)[None, :] + hop * np.arange(n)[:, None]
    return x[:, idx]


def _forward_stft_mat(
    wav: jnp.ndarray,
    kernel: np.ndarray,  # [2B, W]
    window: np.ndarray,  # [W]
    return_polar: bool = False,
    pre_emphasis: float = 0.0,
    frame_hop: int = 256,
    onesided: bool = False,
    center: bool = False,
    eps: float = EPSILON,
) -> jnp.ndarray:
    """Matmul-framed STFT.  Input N x (C) x S; output N x (C) x B(/2+1) x T
    x 2 ([real; imag] or [mag; phase]) — reference stft.py:226-289."""
    wav_dim = wav.ndim
    if wav_dim not in (2, 3):
        raise RuntimeError(f"STFT expect 2D/3D tensor, but got {wav_dim}D")
    N, S = wav.shape[0], wav.shape[-1]
    x = wav.reshape(-1, S)
    W = kernel.shape[-1]
    if center:
        pad = W // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(x, W, frame_hop)  # [NC, T, W]
    if pre_emphasis > 0:
        # Kaldi preemphasis applied per frame (reference stft.py:264-268)
        head = frames[..., :1] * (1.0 - pre_emphasis)
        tail = frames[..., 1:] - pre_emphasis * frames[..., :-1]
        frames = jnp.concatenate([head, tail], axis=-1)
    kw = jnp.asarray(kernel * window[None, :])  # [2B, W]
    packed = jnp.einsum(
        "ntw,cw->nct", frames, kw, preferred_element_type=jnp.float32
    )  # [NC, 2B, T]
    if wav_dim == 3:
        packed = packed.reshape(N, -1, packed.shape[-2], packed.shape[-1])
    real, imag = jnp.split(packed, 2, axis=-2)
    if onesided:
        num_bins = kernel.shape[0] // 4 + 1
        real = real[..., :num_bins, :]
        imag = imag[..., :num_bins, :]
    if return_polar:
        mag = jnp.sqrt(real**2 + imag**2 + eps)
        pha = jnp.arctan2(imag, real)
        return jnp.stack([mag, pha], axis=-1)
    return jnp.stack([real, imag], axis=-1)


def _inverse_stft_mat(
    transform: jnp.ndarray,
    kernel: np.ndarray,  # [2B, W] inverse kernel
    window: np.ndarray,  # [W]
    return_polar: bool = False,
    frame_hop: int = 256,
    onesided: bool = False,
    center: bool = False,
    eps: float = EPSILON,
) -> jnp.ndarray:
    """Matmul + overlap-add iSTFT with window-square envelope normalization
    — reference stft.py:291-358 (conv_transpose1d → transposed matmul)."""
    from ..ops.conv import overlap_add

    tdim = transform.ndim
    if tdim == 3:
        transform = transform[None]
    if transform.ndim != 4:
        raise RuntimeError(f"Expect 4D tensor, but got {tdim}D")
    if return_polar:
        real = transform[..., 0] * jnp.cos(transform[..., 1])
        imag = transform[..., 0] * jnp.sin(transform[..., 1])
    else:
        real, imag = transform[..., 0], transform[..., 1]
    if onesided:
        # rebuild the conjugate-symmetric upper bins [B/2-1 .. 1]
        rev = list(range(kernel.shape[0] // 4 - 1, 0, -1))
        real = jnp.concatenate([real, real[:, rev]], 1)
        imag = jnp.concatenate([imag, -imag[:, rev]], 1)
    packed = jnp.concatenate([real, imag], axis=1)  # [N, 2B, T]
    kw = jnp.asarray(kernel * window[None, :])  # [2B, W]
    frames = jnp.einsum(
        "nct,cw->ntw", packed, kw, preferred_element_type=jnp.float32
    )  # [N, T, W]
    wav = overlap_add(frames, frame_hop)  # [N, S]
    n_frames = packed.shape[-1]
    wsq = jnp.broadcast_to(
        jnp.asarray(window[None, None, :] ** 2), (1, n_frames, window.shape[0])
    )
    denorm = overlap_add(wsq, frame_hop)  # [1, S]
    if center:
        pad = kernel.shape[-1] // 2
        wav = wav[..., pad:-pad]
        denorm = denorm[..., pad:-pad]
    return wav / (denorm + eps)


def forward_stft(
    wav: jnp.ndarray,
    frame_len: int,
    frame_hop: int,
    window: str = "sqrthann",
    round_pow_of_two: bool = True,
    return_polar: bool = False,
    pre_emphasis: float = 0.0,
    normalized: bool = False,
    onesided: bool = True,
    center: bool = False,
    mode: str = "librosa",
    eps: float = EPSILON,
) -> jnp.ndarray:
    """Functional STFT, all three reference modes — stft.py:477-545.

    "librosa"/"kaldi" run the DFT-matrix matmul path; "torch" delegates to
    the jnp.fft torch-convention implementation in ``ops.stft``.
    """
    win = init_window(window, frame_len)
    if mode == "torch":
        n_fft = (
            2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
        )
        return _torch_mode_stft(
            wav, frame_len, frame_hop, n_fft, win, return_polar,
            normalized, onesided, center, eps,
        )
    kernel, win = init_kernel(
        frame_len, frame_hop, win, round_pow_of_two=round_pow_of_two,
        normalized=normalized, inverse=False, mode=mode,
    )
    return _forward_stft_mat(
        wav, kernel, win, return_polar=return_polar, pre_emphasis=pre_emphasis,
        frame_hop=frame_hop, onesided=onesided, center=center, eps=eps,
    )


def inverse_stft(
    transform: jnp.ndarray,
    frame_len: int,
    frame_hop: int,
    return_polar: bool = False,
    window: str = "sqrthann",
    round_pow_of_two: bool = True,
    normalized: bool = False,
    onesided: bool = True,
    center: bool = False,
    mode: str = "librosa",
    eps: float = EPSILON,
) -> jnp.ndarray:
    """Functional iSTFT — reference stft.py:547-612."""
    win = init_window(window, frame_len)
    if mode == "torch":
        n_fft = (
            2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
        )
        return _torch_mode_istft(
            transform, frame_len, frame_hop, n_fft, win, return_polar,
            normalized, onesided, center,
        )
    kernel, win = init_kernel(
        frame_len, frame_hop, win, round_pow_of_two=round_pow_of_two,
        normalized=normalized, inverse=True, mode=mode,
    )
    return _inverse_stft_mat(
        transform, kernel, win, return_polar=return_polar,
        frame_hop=frame_hop, onesided=onesided, center=center, eps=eps,
    )


def _torch_mode_stft(
    wav, frame_len, frame_hop, n_fft, win, return_polar, normalized,
    onesided, center, eps,
):
    """torch.stft-convention mode over ops.stft (jnp.fft path).  torch pads
    win_length windows to n_fft centered, center-pads the signal with
    reflect, and scales by n_fft^-1/2 under ``normalized``."""
    wav_dim = wav.ndim
    if wav_dim not in (2, 3):
        raise RuntimeError(f"STFT expect 2D/3D tensor, but got {wav_dim}D")
    N = wav.shape[0]
    x = wav.reshape(-1, wav.shape[-1])
    if n_fft != frame_len:
        lpad = (n_fft - frame_len) // 2
        win = np.pad(win, (lpad, n_fft - frame_len - lpad))
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    frames = _frame(x, n_fft, frame_hop) * jnp.asarray(win)
    spec = jnp.fft.fft(frames, axis=-1)  # [NC, T, B]
    if normalized:
        spec = spec / (n_fft**0.5)
    if onesided:
        spec = spec[..., : n_fft // 2 + 1]
    real = jnp.swapaxes(spec.real, -1, -2)  # [NC, F, T]
    imag = jnp.swapaxes(spec.imag, -1, -2)
    if wav_dim == 3:
        real = real.reshape(N, -1, *real.shape[1:])
        imag = imag.reshape(N, -1, *imag.shape[1:])
    if return_polar:
        mag = jnp.sqrt(real**2 + imag**2 + eps)
        pha = jnp.arctan2(imag, real)
        return jnp.stack([mag, pha], axis=-1)
    return jnp.stack([real, imag], axis=-1)


def _torch_mode_istft(
    transform, frame_len, frame_hop, n_fft, win, return_polar, normalized,
    onesided, center,
):
    """torch.istft-convention inverse (window-square normalization)."""
    from ..ops.stft import istft as _istft

    tdim = transform.ndim
    if tdim == 3:
        transform = transform[None]
    if transform.ndim != 4:
        raise RuntimeError(f"Expect 4D tensor, but got {tdim}D")
    if return_polar:
        real = transform[..., 0] * jnp.cos(transform[..., 1])
        imag = transform[..., 0] * jnp.sin(transform[..., 1])
    else:
        real, imag = transform[..., 0], transform[..., 1]
    spec = real + 1j * imag  # [N, F, T]
    if normalized:
        spec = spec * (n_fft**0.5)
    if not onesided:
        spec = spec[:, : n_fft // 2 + 1]
    if n_fft != frame_len:
        lpad = (n_fft - frame_len) // 2
        win = np.pad(win, (lpad, n_fft - frame_len - lpad))
    return _istft(
        spec, n_fft, frame_hop, jnp.asarray(win), center=center, length=None
    )


# ---------------------------------------------------------------------------
# layer classes
# ---------------------------------------------------------------------------

class _STFTBase:
    """Holds precomputed kernel/window; reference STFTBase (stft.py:613-696).

    Kernels are plain numpy constants closed over by jitted callers — the
    flax-module ceremony of the torch version (requires_grad=False
    Parameters) has no JAX analog to replicate.
    """

    def __init__(
        self,
        frame_len: int,
        frame_hop: int,
        window: str = "sqrthann",
        round_pow_of_two: bool = True,
        normalized: bool = False,
        pre_emphasis: float = 0.0,
        onesided: bool = True,
        inverse: bool = False,
        center: bool = False,
        mode: str = "librosa",
    ) -> None:
        if mode != "torch":
            K, w = init_kernel(
                frame_len, frame_hop, init_window(window, frame_len),
                round_pow_of_two=round_pow_of_two, normalized=normalized,
                inverse=inverse, mode=mode,
            )
            self.K, self.w = K, w
            self.num_bins = K.shape[0] // 4 + 1
            self.pre_emphasis = pre_emphasis
            self.win_length = K.shape[1]
        else:
            self.K = None
            self.w = init_window(window, frame_len)
            fft_size = (
                2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two
                else frame_len
            )
            self.num_bins = fft_size // 2 + 1
            self.pre_emphasis = 0.0
            self.win_length = fft_size
        self.frame_len = frame_len
        self.frame_hop = frame_hop
        self.window = window
        self.normalized = normalized
        self.onesided = onesided
        self.center = center
        self.mode = mode

    def num_frames(self, wav_len):
        """Frame count for given signal lengths (reference stft.py:674-681)."""
        wav_len = np.asarray(wav_len)
        assert np.all(wav_len > self.win_length)
        if self.center:
            wav_len = wav_len + self.win_length
        return (wav_len - self.win_length) // self.frame_hop + 1

    def extra_repr(self) -> str:
        s = (
            f"num_bins={self.num_bins}, win_length={self.win_length}, "
            f"stride={self.frame_hop}, window={self.window}, "
            f"center={self.center}, mode={self.mode}"
        )
        if not self.onesided:
            s += f", onesided={self.onesided}"
        if self.pre_emphasis > 0:
            s += f", pre_emphasis={self.pre_emphasis}"
        if self.normalized:
            s += f", normalized={self.normalized}"
        return s

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.extra_repr()})"


class STFT(_STFTBase):
    """STFT layer: N x (C) x S → N x (C) x F x T x 2 (stft.py:699-738)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, inverse=False, **kwargs)

    def __call__(self, wav, return_polar: bool = False, eps: float = EPSILON):
        if self.mode == "torch":
            return _torch_mode_stft(
                wav, self.frame_len, self.frame_hop, (self.num_bins - 1) * 2,
                self.w, return_polar, self.normalized, self.onesided,
                self.center, eps,
            )
        return _forward_stft_mat(
            wav, self.K, self.w, return_polar=return_polar,
            pre_emphasis=self.pre_emphasis, frame_hop=self.frame_hop,
            onesided=self.onesided, center=self.center, eps=eps,
        )


class iSTFT(_STFTBase):
    """iSTFT layer: N x F x T x 2 → N x S (stft.py:741-780)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, inverse=True, **kwargs)

    def __call__(self, transform, return_polar: bool = False, eps: float = EPSILON):
        if self.mode == "torch":
            return _torch_mode_istft(
                transform, self.frame_len, self.frame_hop,
                (self.num_bins - 1) * 2, self.w, return_polar,
                self.normalized, self.onesided, self.center,
            )
        return _inverse_stft_mat(
            transform, self.K, self.w, return_polar=return_polar,
            frame_hop=self.frame_hop, onesided=self.onesided,
            center=self.center, eps=eps,
        )
