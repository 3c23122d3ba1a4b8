"""PESQ estimator invariants (metrics/pesq.py).

No ITU conformance vectors exist in this environment (zero egress, no
`pesq` wheel), so these tests pin the behavioral contract instead:
identity scores at the ceiling, monotone degradation in noise level,
range clipping, delay robustness, and tracker integration.
"""

import os

import numpy as np
import pytest

from audio_only_speech_separation_tpu.metrics import MetricsTracker, pesq, pesq_batch


def _speech_like(sr, seconds=2.0, seed=0):
    """Synthetic voiced speech: pitch-pulsed formant resonances + envelope."""
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    f0 = 120 + 20 * np.sin(2 * np.pi * 1.7 * t)
    phase = np.cumsum(f0) / sr
    x = np.zeros(n)
    for k, amp in ((1, 1.0), (2, 0.6), (3, 0.4), (5, 0.3), (8, 0.2)):
        x += amp * np.sin(2 * np.pi * k * phase)
    envelope = 0.5 * (1 + np.sign(np.sin(2 * np.pi * 2.5 * t)))  # syllables
    x = x * (0.2 + 0.8 * envelope) + 0.01 * rng.normal(size=n)
    return (x / np.abs(x).max()).astype(np.float64)


@pytest.mark.parametrize("sr", [8000, 16000])
def test_identity_scores_ceiling(sr):
    x = _speech_like(sr)
    score = pesq(x, x, sr)
    assert score > 4.4


@pytest.mark.parametrize("sr", [8000, 16000])
def test_monotone_in_noise(sr):
    x = _speech_like(sr)
    rng = np.random.default_rng(1)
    noise = rng.normal(size=x.size)
    noise /= np.sqrt(np.mean(noise**2))
    rms = np.sqrt(np.mean(x**2))
    scores = []
    for snr_db in (40, 20, 10, 0, -10):
        deg = x + noise * rms * 10 ** (-snr_db / 20)
        scores.append(pesq(x, deg, sr))
    diffs = np.diff(scores)
    assert np.all(diffs < 0.05), scores  # monotone non-increasing (tol for ties)
    assert scores[0] - scores[-1] > 1.0, scores  # a full MOS point of range
    assert all(1.0 <= s <= 4.65 for s in scores)


def test_amplitude_invariance():
    x = _speech_like(8000)
    assert abs(pesq(x, 0.25 * x, 8000) - pesq(x, x, 8000)) < 0.05


def test_delay_robustness():
    x = _speech_like(8000)
    delayed = np.concatenate([np.zeros(400), x])[: x.size]
    assert pesq(x, delayed, 8000) > 4.0


def test_clipping_distortion_hurts():
    x = _speech_like(8000)
    clipped = np.clip(x, -0.05, 0.05)
    assert pesq(x, clipped, 8000) < pesq(x, x, 8000) - 0.3


def test_rejects_bad_rate_and_short():
    with pytest.raises(ValueError):
        pesq(np.zeros(8000), np.zeros(8000), 44100)
    with pytest.raises(ValueError):
        pesq(np.zeros(100), np.zeros(100), 8000)


def test_batch_shape():
    x = np.stack([_speech_like(8000, 1.0, s) for s in range(4)]).reshape(2, 2, -1)
    out = pesq_batch(x, x, 8000)
    assert out.shape == (2, 2)
    assert np.all(out > 4.4)


def test_tracker_pesq_column(tmp_path):
    sr = 8000
    a = _speech_like(sr, 1.0, 2)
    b = _speech_like(sr, 1.0, 3)
    mix = a + b
    tracker = MetricsTracker(
        save_file=os.fspath(tmp_path / "m.csv"), compute_pesq=True, sample_rate=sr
    )
    # swapped estimate ordering: permutation search must still find the match
    tracker(mix, np.stack([a, b]), np.stack([b, a]), "utt0")
    tracker.final()
    rows = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert rows[0].endswith("pesq_est")
    assert float(rows[1].split(",")[-1]) > 4.0


def test_conformance_vs_itu_pesq_if_available():
    """Gated cross-validation against the ITU-conformant `pesq` wheel
    (mirrors the fast_bss_eval gate in test_metrics.py): self-skips in this
    environment, pins the estimator the moment a reference implementation
    is importable.  Checks (a) rank agreement across a degradation ladder
    and (b) loose absolute agreement — pesq_est is a P.862-structure
    estimator, not a bit-exact reimplementation."""
    itu = None
    try:
        from pesq import pesq as itu  # pip package `pesq`
    except ImportError:
        try:
            from pypesq import pesq as itu  # pip package `pypesq`
        except ImportError:
            pass
    if itu is None:
        pytest.skip("no ITU-conformant pesq implementation in environment")

    sr = 16000
    x = _speech_like(sr, 4.0, 0)
    rng = np.random.default_rng(1)
    noise = rng.normal(size=x.shape)
    noise /= np.abs(noise).max()
    ours, theirs = [], []
    for snr_db in (40.0, 20.0, 10.0, 5.0, 0.0):
        deg = x + noise * 10 ** (-snr_db / 20.0)
        ours.append(pesq(x, deg, sr))
        try:
            theirs.append(float(itu(sr, x, deg, "wb")))  # `pesq` signature
        except TypeError:
            theirs.append(float(itu(x, deg, sr)))  # `pypesq` signature
    # (a) strict rank agreement down the ladder
    assert np.all(np.diff(ours) < 0) and np.all(np.diff(theirs) < 0)
    # (b) loose absolute agreement (structure estimator, not conformant)
    assert np.max(np.abs(np.asarray(ours) - np.asarray(theirs))) < 0.8
