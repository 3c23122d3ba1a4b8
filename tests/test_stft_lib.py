"""Golden tests for the general STFT layer library (layers/stft_lib.py).

Two tiers:
- pure invariant/golden tests (fast, always run): window formulas vs torch,
  DFT kernel orthogonality, mel filterbank triangle structure, resampler
  DC gain, STFT↔iSTFT round-trips in every mode;
- direct parity vs the reference implementation at /root/reference
  (slow-marked): same inputs → same transforms.  The reference module
  imports librosa at module top for its mel filters; librosa is absent in
  this environment, so a minimal stub is injected for the import — the mel
  path itself is then NOT comparable through the reference and is covered
  by the structural golden tests instead.
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

from audio_only_speech_separation_tpu.layers import (
    STFT,
    forward_stft,
    init_kernel,
    init_window,
    inverse_stft,
    iSTFT,
    mel_filter,
    speed_perturb_filter,
    splice_feature,
)


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("wnd", ["hann", "hamm", "blackman", "bartlett", "rect", "sqrthann"])
def test_windows_match_torch(wnd):
    torch = pytest.importorskip("torch")
    N = 400
    tpl = {
        "hann": lambda: torch.hann_window(N, periodic=True),
        "hamm": lambda: torch.hamming_window(N, periodic=True),
        "blackman": lambda: torch.blackman_window(N, periodic=True),
        "bartlett": lambda: torch.bartlett_window(N, periodic=True),
        "rect": lambda: torch.ones(N),
        "sqrthann": lambda: torch.hann_window(N, periodic=True) ** 0.5,
    }
    want = tpl[wnd]().numpy()
    got = init_window(wnd, N)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_unknown_window_raises():
    with pytest.raises(RuntimeError):
        init_window("kaiser", 256)


# ---------------------------------------------------------------------------
# DFT kernels
# ---------------------------------------------------------------------------

def test_kernel_shapes_and_fft_size():
    w = init_window("hann", 400)
    K, win = init_kernel(400, 160, w, round_pow_of_two=True, mode="librosa")
    assert K.shape == (1024, 512)  # fft 512, librosa frames fft_size samples
    assert win.shape == (512,)
    # centered zero-padding of the window
    assert np.all(win[:56] == 0) and np.all(win[56 + 400 :] == 0)

    K, win = init_kernel(400, 160, w, mode="kaldi")
    assert K.shape == (1024, 400)  # kaldi keeps W = frame_len
    assert win.shape == (400,)

    K, win = init_kernel(512, 256, init_window("hann", 512), round_pow_of_two=False)
    assert K.shape == (1024, 512)


def test_kernel_is_dft_matrix():
    N = 64
    K, _ = init_kernel(N, 32, init_window("rect", N), round_pow_of_two=False)
    re, im = K[:N], K[N:]
    F = np.fft.fft(np.eye(N), axis=-1)
    np.testing.assert_allclose(re, F.real.T, atol=1e-5)
    np.testing.assert_allclose(im, F.imag.T, atol=1e-5)


def test_forward_inverse_kernels_are_inverses():
    # K_fwd^T K_inv = I on the window support (rect window, no overlap)
    N = 128
    w = init_window("rect", N)
    Kf, _ = init_kernel(N, N, w, round_pow_of_two=False, inverse=False)
    Ki, _ = init_kernel(N, N, w, round_pow_of_two=False, inverse=True)
    # complex recombine: x → (re, im) → x
    prod = Ki.T @ Kf  # [W, W]... real part of IDFT·DFT
    np.testing.assert_allclose(prod, np.eye(N), atol=1e-4)


def test_normalized_kernel_unitary():
    N = 64
    w = init_window("rect", N)
    Kn, _ = init_kernel(N, N, w, round_pow_of_two=False, normalized=True)
    np.testing.assert_allclose(Kn.T @ Kn, np.eye(N), atol=1e-4)


# ---------------------------------------------------------------------------
# mel filterbank
# ---------------------------------------------------------------------------

def test_mel_filter_structure():
    sr, n_mels = 16000, 40
    fb = mel_filter(400, sr=sr, num_mels=n_mels)
    F = 512 // 2 + 1
    assert fb.shape == (n_mels, F)
    assert np.all(fb >= 0)
    # triangles: each filter is unimodal with peak 1.0 (norm=False)
    for m in range(n_mels):
        row = fb[m]
        assert row.max() <= 1.0 + 1e-6
        peak = row.argmax()
        assert np.all(np.diff(row[: peak + 1]) >= -1e-7)
        assert np.all(np.diff(row[peak:]) <= 1e-7)
    # band centers ascend in frequency
    centers = fb.argmax(axis=1)
    assert np.all(np.diff(centers) >= 0)


def test_mel_filter_matches_direct_htk_formula():
    """Independent reconstruction: weight of filter m at fft bin f is the
    triangle between HTK-mel band edges (librosa.filters.mel htk=True)."""
    sr, n_fft, n_mels = 8000, 256, 23
    fb = mel_filter(0, num_bins=n_fft // 2 + 1, sr=sr, num_mels=n_mels)

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    edges = mel2hz(np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2))
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    want = np.zeros((n_mels, freqs.size))
    for m in range(n_mels):
        lo, ce, hi = edges[m], edges[m + 1], edges[m + 2]
        rising = (freqs - lo) / (ce - lo)
        falling = (hi - freqs) / (hi - ce)
        want[m] = np.maximum(0.0, np.minimum(rising, falling))
    np.testing.assert_allclose(fb, want, atol=1e-5)


def test_mel_filter_slaney_norm_and_fmax_quirks():
    fb = mel_filter(400, sr=16000, num_mels=40, norm=True)
    assert fb.max() < 1.0  # area-normalized triangles are < 1 at 16 kHz
    # negative fmax means Nyquist + fmax (reference stft.py:147-150)
    a = mel_filter(400, sr=16000, num_mels=40, fmax=-2000)
    b = mel_filter(400, sr=16000, num_mels=40, fmax=6000)
    np.testing.assert_allclose(a, b)


# ---------------------------------------------------------------------------
# speed-perturbation filter
# ---------------------------------------------------------------------------

def test_speed_perturb_filter_shape_and_gain():
    w = speed_perturb_filter(16000, 17600)  # gcd 1600 → 10 → 11
    dst, src = 11, 10
    assert w.shape[0] == dst and w.shape[1] == src
    assert w.shape[2] % 2 == 1
    # DC gain: each output phase must sum input samples to ~dst/src·(src/dst)=1
    # (windowed-sinc interpolation preserves constants)
    gains = w.sum(axis=(1, 2))
    np.testing.assert_allclose(gains, np.ones(dst), atol=5e-3)


def test_speed_perturb_filter_validation():
    with pytest.raises(ValueError):
        speed_perturb_filter(16000, 16000)
    with pytest.raises(ValueError):
        speed_perturb_filter(8000, 16000)  # integer ratio unsupported


# ---------------------------------------------------------------------------
# splice
# ---------------------------------------------------------------------------

def test_splice_feature_cat_and_stack():
    import jax.numpy as jnp

    x = jnp.asarray(np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3))
    cat = splice_feature(x, 1, 1, op="cat")
    assert cat.shape == (2, 5, 9)
    st = splice_feature(x, 1, 2, op="stack")
    assert st.shape == (2, 5, 3, 4)
    # edge clamping: first frame's left context is itself
    np.testing.assert_allclose(np.asarray(cat[0, 0, :3]), np.asarray(x[0, 0]))
    np.testing.assert_allclose(np.asarray(cat[0, 0, 3:6]), np.asarray(x[0, 0]))
    np.testing.assert_allclose(np.asarray(cat[0, 0, 6:]), np.asarray(x[0, 1]))
    assert splice_feature(x, 0, 0) is x


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["librosa", "kaldi", "torch"])
@pytest.mark.parametrize("onesided", [True, False])
def test_stft_istft_round_trip(mode, onesided):
    if mode == "torch" and not onesided:
        pytest.skip("torch.istft convention is onesided")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8000)).astype(np.float32)
    kw = dict(
        frame_len=400, frame_hop=160, window="hann", center=True, mode=mode,
        onesided=onesided,
    )
    t = forward_stft(np.asarray(x), **kw)
    y = np.asarray(inverse_stft(t, **kw))
    n = min(x.shape[-1], y.shape[-1])
    # trim the first/last frames where the window envelope is partial
    sl = slice(800, n - 800)
    np.testing.assert_allclose(y[:, sl], x[:, sl], atol=1e-3)


def test_polar_round_trip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4000)).astype(np.float32)
    kw = dict(frame_len=256, frame_hop=128, window="sqrthann", center=True)
    t = forward_stft(np.asarray(x), return_polar=True, **kw)
    y = np.asarray(inverse_stft(t, return_polar=True, **kw))
    n = min(x.shape[-1], y.shape[-1])
    np.testing.assert_allclose(y[:, 512 : n - 512], x[:, 512 : n - 512], atol=1e-3)


def test_layer_classes_match_functional():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4000)).astype(np.float32)
    kw = dict(frame_len=320, frame_hop=160, window="hann", center=True)
    f = STFT(**kw)
    assert f.num_bins == 512 // 2 + 1
    t1 = np.asarray(f(np.asarray(x)))
    t2 = np.asarray(forward_stft(np.asarray(x), **kw))
    np.testing.assert_allclose(t1, t2, atol=1e-6)
    inv = iSTFT(**kw)
    y = np.asarray(inv(t1))
    n = min(x.shape[-1], y.shape[-1])
    np.testing.assert_allclose(y[:, 640 : n - 640], x[:, 640 : n - 640], atol=1e-3)
    assert f.num_frames(4000) == (4000 + 512 - 512) // 160 + 1
    assert "num_bins=257" in repr(f)


def test_multichannel_and_pre_emphasis():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 4000)).astype(np.float32)
    t = forward_stft(np.asarray(x), 256, 128, window="hann", mode="kaldi")
    assert t.shape[:2] == (2, 3) and t.shape[-1] == 2
    tp = forward_stft(
        np.asarray(x), 256, 128, window="hann", mode="kaldi", pre_emphasis=0.97
    )
    assert tp.shape == t.shape
    assert not np.allclose(np.asarray(tp), np.asarray(t))


# ---------------------------------------------------------------------------
# reference parity (slow; loads /root/reference with a librosa stub)
# ---------------------------------------------------------------------------

def _load_reference_stft():
    torch = pytest.importorskip("torch")  # noqa: F841
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def _mel_unavailable(*a, **k):  # pragma: no cover
            raise RuntimeError("librosa stub: mel not available")

        filters.mel = _mel_unavailable
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    spec = importlib.util.spec_from_file_location(
        "ref_stft", "/root/reference/look2hear/layers/stft.py"
    )
    if spec is None:  # pragma: no cover
        pytest.skip("reference not present")
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except FileNotFoundError:  # pragma: no cover
        pytest.skip("reference not present")
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["librosa", "kaldi"])
@pytest.mark.parametrize("wnd", ["hann", "sqrthann", "hamm"])
def test_forward_stft_matches_reference(mode, wnd):
    import torch

    ref = _load_reference_stft()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4000)).astype(np.float32)
    for center in (False, True):
        for onesided in (True, False):
            want = ref.forward_stft(
                torch.from_numpy(x), 256, 128, window=wnd, center=center,
                onesided=onesided, mode=mode,
            ).numpy()
            got = np.asarray(
                forward_stft(
                    np.asarray(x), 256, 128, window=wnd, center=center,
                    onesided=onesided, mode=mode,
                )
            )
            np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["librosa", "kaldi"])
def test_inverse_stft_matches_reference(mode):
    import torch

    ref = _load_reference_stft()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 4000)).astype(np.float32)
    t_np = np.asarray(
        forward_stft(np.asarray(x), 256, 128, window="hann", mode=mode)
    )
    want = ref.inverse_stft(
        torch.from_numpy(t_np), 256, 128, window="hann", mode=mode
    ).numpy()
    got = np.asarray(inverse_stft(t_np, 256, 128, window="hann", mode=mode))
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.slow
def test_pre_emphasis_matches_reference():
    import torch

    ref = _load_reference_stft()
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 4000)).astype(np.float32)
    want = ref.forward_stft(
        torch.from_numpy(x), 256, 128, window="hamm", mode="kaldi",
        pre_emphasis=0.97,
    ).numpy()
    got = np.asarray(
        forward_stft(
            np.asarray(x), 256, 128, window="hamm", mode="kaldi",
            pre_emphasis=0.97,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-3)


@pytest.mark.slow
def test_speed_perturb_matches_reference():
    ref = _load_reference_stft()
    want = ref.speed_perturb_filter(16000, 17600).numpy()
    got = speed_perturb_filter(16000, 17600)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_torch_mode_matches_reference():
    import torch

    ref = _load_reference_stft()
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4000)).astype(np.float32)
    for center in (False, True):
        for normalized in (False, True):
            want = ref.forward_stft(
                torch.from_numpy(x), 400, 160, window="hann", center=center,
                normalized=normalized, mode="torch",
            ).numpy()
            got = np.asarray(
                forward_stft(
                    np.asarray(x), 400, 160, window="hann", center=center,
                    normalized=normalized, mode="torch",
                )
            )
            np.testing.assert_allclose(got, want, atol=2e-3)
