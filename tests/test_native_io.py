"""Native wav IO tests (skipped when no C++ toolchain)."""

import os

import numpy as np
import pytest

from audio_only_speech_separation_tpu.data import native
from audio_only_speech_separation_tpu.data.audio_io import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native.available(), reason="libwavio not built")


@pytest.fixture
def wav_file(tmp_path):
    x = (np.sin(np.linspace(0, 50, 4000)) * 0.4).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 8000)
    return p, x


class TestNativeWavIO:
    def test_full_read_matches_python(self, wav_file):
        p, x = wav_file
        got = native.read_window(p)
        # PCM16 quantization only
        np.testing.assert_allclose(got, x, atol=1e-4)

    def test_window_read(self, wav_file):
        p, _ = wav_file
        full = native.read_window(p)
        win = native.read_window(p, 123, 456)
        np.testing.assert_array_equal(win, full[123 : 123 + 456])

    def test_num_frames(self, wav_file):
        p, x = wav_file
        assert native.num_frames(p) == len(x)

    def test_batch_parallel(self, wav_file):
        p, _ = wav_file
        full = native.read_window(p)
        out = native.read_batch([p] * 5, [0, 10, 20, 30, 40], 100, n_threads=3)
        for i, s in enumerate([0, 10, 20, 30, 40]):
            np.testing.assert_array_equal(out[i], full[s : s + 100])

    def test_read_past_end_zero_fills(self, wav_file):
        p, x = wav_file
        out = native.read_batch([p], [len(x) - 50], 100)
        assert out.shape == (1, 100)
        np.testing.assert_array_equal(out[0, 50:], 0.0)

    def test_audio_io_prefers_native(self, wav_file):
        p, x = wav_file
        got = read_wav(p, 5, 105)
        np.testing.assert_allclose(got, x[5:105], atol=1e-4)
