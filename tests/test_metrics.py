"""Metrics tests: SI-SNR(i)/SDR(i) trackers and the Toeplitz SDR."""

import csv
import os

import numpy as np
import pytest

from audio_only_speech_separation_tpu.metrics import (
    MetricsTracker,
    SPlitMetricsTracker,
    sdr_pit,
)


@pytest.fixture
def synth(rng):
    """Two sources + mixture, estimates = slightly noisy sources."""
    s = rng.normal(size=(2, 4000)).astype(np.float32) * 0.1
    mix = s.sum(0)
    est = s + 0.01 * rng.normal(size=s.shape).astype(np.float32)
    return mix, s, est


class TestSDR:
    def test_perfect_estimate_high_sdr(self, synth):
        _, s, _ = synth
        vals = sdr_pit(s, s.copy())
        assert np.all(vals > 40)

    def test_permutation_invariant(self, synth):
        _, s, est = synth
        v1 = sdr_pit(s, est)
        v2 = sdr_pit(s, est[::-1])
        np.testing.assert_allclose(sorted(v1), sorted(v2), rtol=1e-5)

    def test_filter_invariance(self, rng):
        # SDR must forgive a short causal FIR distortion (that's its point)
        s = rng.normal(size=(1, 6000)).astype(np.float32)
        h = np.array([0.9, 0.05, -0.02], np.float32)
        est = np.convolve(s[0], h)[:6000][None].astype(np.float32)
        assert sdr_pit(s, est)[0] > 25

    def test_matches_fast_bss_eval_if_available(self, rng):
        fbe = pytest.importorskip("fast_bss_eval")
        import torch

        s = rng.normal(size=(2, 6000)).astype(np.float32)
        est = (s + 0.05 * rng.normal(size=s.shape)).astype(np.float32)
        want = -fbe.sdr_pit_loss(torch.from_numpy(s), torch.from_numpy(est)).numpy()
        got = sdr_pit(s, est)
        np.testing.assert_allclose(got, want, rtol=0.02, atol=0.1)


class TestMetricsTracker:
    def test_csv_rows_and_final(self, tmp_path, synth):
        mix, s, est = synth
        path = str(tmp_path / "metrics.csv")
        tracker = MetricsTracker(save_file=path)
        tracker(mix, s, est, "utt1")
        tracker(mix, s, est, "utt2")
        upd = tracker.update()
        assert upd["si-snr_i"] > 5  # estimates clearly better than mixture
        tracker.final()
        rows = list(csv.DictReader(open(path)))
        assert [r["snt_id"] for r in rows] == ["utt1", "utt2", "avg", "std"]
        assert float(rows[2]["si-snr"]) > 15

    def test_split_tracker(self, tmp_path, rng):
        s = rng.normal(size=(3, 3000)).astype(np.float32) * 0.1
        mix = s.sum(0)
        est = s + 0.01 * rng.normal(size=s.shape).astype(np.float32)
        path = str(tmp_path / "split.csv")
        tracker = SPlitMetricsTracker(save_file=path)
        tracker(mix, s, est, "utt1")
        tracker.final()
        rows = list(csv.DictReader(open(path)))
        assert rows[0]["snt_id"] == "utt1" and rows[-1]["snt_id"] == "avg"
        assert float(rows[0]["two_si-snr"]) > 10
        assert float(rows[0]["one_si-snr"]) > 10
