"""Wav IO with partial reads.

The reference reads crops straight from disk via libsndfile
(``sf.read(path, start, stop)``, lrs2datamodule.py:139-146) — random-crop
training never loads the full utterance.  This module keeps that property
without requiring soundfile:

- soundfile when importable (fastest, any format);
- stdlib ``wave`` for PCM16/PCM32/PCM8 with true seek+partial read;
- scipy.io.wavfile full-read fallback (float32/other formats), sliced.

All readers return float32 in [-1, 1] (mono; first channel of
multi-channel files), matching ``sf.read(dtype='float32')``.
"""

from __future__ import annotations

import wave
from typing import Optional

import numpy as np

try:
    import soundfile as _sf

    HAVE_SOUNDFILE = True
except ImportError:  # pragma: no cover
    _sf = None
    HAVE_SOUNDFILE = False


def _native():
    from . import native

    return native.get_lib() and native


def read_wav(path: str, start: int = 0, stop: Optional[int] = None) -> np.ndarray:
    """Read samples [start, stop) as float32 mono.

    Backend preference: native C++ (native/wavio.cpp, GIL-free pread) →
    soundfile → stdlib wave → scipy.
    """
    nat = _native()
    if nat:
        try:
            count = -1 if stop is None else stop - start
            return nat.read_window(path, start, count)
        except (IOError, OSError):
            pass  # non-PCM or exotic format: fall through
    if HAVE_SOUNDFILE:
        data, _ = _sf.read(path, start=start, stop=stop, dtype="float32")
        if data.ndim > 1:
            data = data[:, 0]
        return data
    try:
        return _read_wave_module(path, start, stop)
    except (wave.Error, EOFError):
        return _read_scipy(path, start, stop)


def _read_wave_module(path: str, start: int, stop: Optional[int]) -> np.ndarray:
    with wave.open(path, "rb") as w:
        n_frames = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        stop = n_frames if stop is None else min(stop, n_frames)
        count = max(stop - start, 0)
        w.setpos(start)
        raw = w.readframes(count)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise wave.Error(f"unsupported sample width {width}")
    if channels > 1:
        data = data.reshape(-1, channels)[:, 0].copy()
    return data


def _read_scipy(path: str, start: int, stop: Optional[int]) -> np.ndarray:
    from scipy.io import wavfile

    _, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data[start:stop]


def wav_frames(path: str) -> int:
    """Number of frames without reading the payload."""
    if HAVE_SOUNDFILE:
        with _sf.SoundFile(path) as f:
            return len(f)
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes()
    except (wave.Error, EOFError):
        return len(_read_scipy(path, 0, None))


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """Write float32 [-1, 1] mono as PCM16."""
    if HAVE_SOUNDFILE:
        _sf.write(path, data, sample_rate)
        return
    pcm = np.clip(np.asarray(data, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
