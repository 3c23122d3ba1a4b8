"""Inference helpers (reference: look2hear/utils/separator.py:24-72).

``separate(model, params, wav)`` runs a separation model on a numpy or jnp
waveform, applying the reference's energy renormalization hack
(out *= Σ|in| / Σ|out|, separator.py:59-60) so separated levels track the
input level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Separator:
    def forward_wav(self, wav, **kwargs):
        raise NotImplementedError

    def sample_rate(self):
        raise NotImplementedError


def separate(model, params, wav, **kwargs):
    """wav: numpy or jnp [T] | [B, T] → separated array of the same kind."""
    is_numpy = isinstance(wav, np.ndarray)
    x = jnp.asarray(wav)
    out = model.apply(params, x, **kwargs)
    # energy renormalization (reference separator.py:59-60)
    out = out * (jnp.sum(jnp.abs(x)) / jnp.sum(jnp.abs(out)))
    return np.asarray(out) if is_numpy else out


def wav_file_separate(model, params, in_path: str, out_prefix: str, sample_rate=None):
    """Separate a wav file to `<out_prefix>_s{i}.wav` files."""
    from ..data.audio_io import read_wav, write_wav

    wav = read_wav(in_path)
    sr = sample_rate or getattr(model, "sample_rate", 16000)
    est = separate(model, params, wav[None])[0]
    paths = []
    for i in range(est.shape[0]):
        p = f"{out_prefix}_s{i + 1}.wav"
        write_wav(p, est[i], sr)
        paths.append(p)
    return paths
