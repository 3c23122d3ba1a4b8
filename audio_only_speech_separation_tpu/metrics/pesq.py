"""PESQ — perceptual speech-quality estimator with the ITU-T P.862 structure.

The driver's metric stack names PESQ (BASELINE.md); neither the reference
repo nor this environment ships an implementation (no `pesq`/`pypesq`
wheel, no network), so this module implements the P.862 processing
pipeline from the standard's published algorithm description:

  level alignment → time alignment → Hann STFT power spectra → Bark-band
  grouping → threshold-of-hearing gating → partial gain/frequency
  equalization → Zwicker intensity→loudness → asymmetric + symmetric
  disturbance with masking deadzone → L6-over-syllables / L2-over-time
  aggregation → raw score → P.862.1-style MOS-LQO logistic map.

IMPORTANT caveat, stated plainly: without the ITU reference tables and
conformance vectors this is a faithful *structure* implementation, not a
bit-exact P.862 conformance implementation.  Band edges use the asinh Bark
approximation instead of the ITU table, and the equalization steps are the
published simplified forms.  Scores track the expected behavior (identity
≈ 4.5+, monotone in SNR/distortion, range-clipped) — pinned in
tests/test_pesq.py — and are comparable *within* experiments; do not
compare absolute values against ITU-reference PESQ third-party numbers.

Modes: 'nb' (narrowband, 8 kHz) and 'wb' (wideband, 16 kHz, P.862.2-style
no-IRS weighting).  Pure numpy — the metric is an eval-time host metric,
like the SDR tracker (metrics/sdr.py).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _bark(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _inv_bark(z):
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


def _hearing_threshold_db(f):
    """Terhardt threshold-in-quiet approximation (dB SPL)."""
    fk = np.maximum(np.asarray(f, np.float64), 20.0) / 1000.0
    return (
        3.64 * fk ** -0.8
        - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
        + 1e-3 * fk ** 4
    )


class _PerceptualModel:
    def __init__(self, sample_rate: int):
        if sample_rate == 8000:
            self.frame, self.n_bands, self.f_lo, self.f_hi = 256, 42, 100.0, 3800.0
        elif sample_rate == 16000:
            self.frame, self.n_bands, self.f_lo, self.f_hi = 512, 49, 100.0, 7600.0
        else:
            raise ValueError("PESQ supports 8 kHz (nb) and 16 kHz (wb) only")
        self.sr = sample_rate
        self.shift = self.frame // 2
        self.window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(self.frame) / self.frame))
        freqs = np.fft.rfftfreq(self.frame, 1.0 / sample_rate)
        edges = _inv_bark(
            np.linspace(_bark(self.f_lo), _bark(self.f_hi), self.n_bands + 1)
        )
        # band grouping matrix [n_bins, n_bands], each column a mean pool
        m = np.zeros((freqs.size, self.n_bands))
        idx = np.clip(np.searchsorted(edges, freqs) - 1, -1, self.n_bands)
        for b in range(self.n_bands):
            sel = idx == b
            if sel.any():
                m[sel, b] = 1.0 / sel.sum()
        self.pool = m
        self.centers = 0.5 * (edges[:-1] + edges[1:])
        self.width = np.diff(_bark(edges))  # bark width per band (≈ uniform)
        # absolute threshold as band power (arbitrary internal scale:
        # signals are normalized to a fixed active level first)
        self.threshold = 10.0 ** (_hearing_threshold_db(self.centers) / 10.0)

    def frames(self, x):
        n = 1 + max(0, (x.size - self.frame) // self.shift)
        out = np.lib.stride_tricks.as_strided(
            x,
            shape=(n, self.frame),
            strides=(x.strides[0] * self.shift, x.strides[0]),
        )
        return out * self.window

    def bark_power(self, x):
        spec = np.fft.rfft(self.frames(x), axis=-1)
        power = (spec.real ** 2 + spec.imag ** 2) / self.frame
        return power @ self.pool  # [n_frames, n_bands]

    def loudness(self, bp):
        """Zwicker intensity→loudness (P.862 Sl law, exponent 0.23)."""
        p0 = self.threshold[None, :]
        ratio = np.maximum(bp / p0, 0.0)
        s = (p0 / 0.5) ** 0.23 * ((0.5 + 0.5 * ratio) ** 0.23 - 1.0)
        return np.maximum(s, 0.0)


def _active_level(x, sr):
    """RMS over speech-active frames (simple -40 dB-rel activity gate)."""
    frame = sr // 50
    n = x.size // frame
    if n == 0:
        return np.sqrt(np.mean(x**2) + _EPS)
    e = (x[: n * frame].reshape(n, frame) ** 2).mean(-1)
    gate = e.max() * 1e-4
    act = e[e > gate]
    return np.sqrt(act.mean() + _EPS) if act.size else np.sqrt(e.mean() + _EPS)


def _align(ref, deg, sr, max_shift_s=0.125):
    """Global delay compensation by frame-energy cross-correlation."""
    frame = sr // 100
    n = min(ref.size, deg.size) // frame
    er = (ref[: n * frame].reshape(n, frame) ** 2).sum(-1)
    ed = (deg[: n * frame].reshape(n, frame) ** 2).sum(-1)
    er = er - er.mean()
    ed = ed - ed.mean()
    max_lag = int(max_shift_s * 100)
    lags = range(-max_lag, max_lag + 1)
    scores = [
        np.dot(er[max(0, -l) : n - max(0, l)], ed[max(0, l) : n - max(0, -l)])
        for l in lags
    ]
    lag = list(lags)[int(np.argmax(scores))] * frame
    if lag > 0:
        deg = deg[lag:]
    elif lag < 0:
        ref = ref[-lag:]
    n = min(ref.size, deg.size)
    return ref[:n], deg[:n]


def pesq(ref: np.ndarray, deg: np.ndarray, sample_rate: int = 8000) -> float:
    """MOS-LQO-style score in [1.02, 4.64] (higher = better).

    ``ref`` is the clean reference, ``deg`` the degraded/estimated signal,
    both 1-D at 8 kHz (nb) or 16 kHz (wb).
    """
    ref = np.asarray(ref, np.float64).ravel()
    deg = np.asarray(deg, np.float64).ravel()
    model = _PerceptualModel(sample_rate)

    # level alignment: both to a fixed active level, calibrated so speech
    # sits well above the hearing-threshold curve (P.862 targets ~79 dB SPL;
    # the threshold table is in dB SPL, so the internal scale must match)
    target = 10.0 ** (79.0 / 20.0)
    ref = ref * (target / (_active_level(ref, sample_rate) + _EPS))
    deg = deg * (target / (_active_level(deg, sample_rate) + _EPS))
    ref, deg = _align(ref, deg, sample_rate)
    if ref.size < model.frame * 2:
        raise ValueError("signals too short for PESQ")

    bp_ref = model.bark_power(ref)
    bp_deg = model.bark_power(deg)

    # partial frequency equalization: per-band mean ratio over active
    # frames, clipped ±20 dB (compensates the receive-path filter)
    active = bp_ref.sum(-1) > bp_ref.sum(-1).max() * 1e-3
    num = bp_ref[active].mean(0) + 1e3 * _EPS
    den = bp_deg[active].mean(0) + 1e3 * _EPS
    eq = np.clip(num / den, 1e-2, 1e2)
    bp_deg = bp_deg * eq[None, :]

    # partial gain equalization: per-frame total-power ratio, clipped,
    # smoothed (first-order) along time
    g = (bp_ref.sum(-1) + 1e3 * _EPS) / (bp_deg.sum(-1) + 1e3 * _EPS)
    g = np.clip(g, 3e-4, 5.0)
    for i in range(1, g.size):
        g[i] = 0.8 * g[i - 1] + 0.2 * g[i]
    bp_deg = bp_deg * g[:, None]

    s_ref = model.loudness(bp_ref)
    s_deg = model.loudness(bp_deg)

    # disturbance with masking deadzone
    diff = s_deg - s_ref
    dead = 0.25 * np.minimum(s_deg, s_ref)
    d = np.sign(diff) * np.maximum(np.abs(diff) - dead, 0.0)

    # asymmetry factor: additive (coding) noise hurts more than omission
    h = ((bp_deg + 50.0) / (bp_ref + 50.0)) ** 1.2
    h = np.where(h < 3.0, 0.0, np.minimum(h, 12.0))

    w = model.width[None, :]
    frame_d = np.sqrt(np.sum(w * d**2, axis=-1) / w.sum())
    frame_da = np.sum(np.abs(d) * h * w, axis=-1) / w.sum()

    # weight silent frames down (P.862 weights by (E_ref + 1e5)^0.04)
    e_ref = bp_ref.sum(-1)
    wt = ((e_ref + 1e5 * _EPS) / (e_ref.max() + 1e5 * _EPS)) ** 0.04

    def aggregate(fd, p_syl=6.0, p_time=2.0, syl=20):
        fd = fd * wt
        n = fd.size
        chunks = [fd[i : i + syl] for i in range(0, n, syl // 2)]
        vals = [np.mean(c**p_syl) ** (1.0 / p_syl) for c in chunks if c.size]
        return np.mean(np.asarray(vals) ** p_time) ** (1.0 / p_time)

    d_sym = aggregate(frame_d)
    d_asym = aggregate(frame_da)

    raw = 4.5 - 0.1 * d_sym - 0.0309 * d_asym
    # P.862.1 logistic MOS-LQO map
    mos = 0.999 + (4.999 - 0.999) / (1.0 + np.exp(-1.4945 * raw + 4.6607))
    return float(np.clip(mos, 1.02, 4.64))


def pesq_batch(ref, deg, sample_rate: int = 8000):
    """PESQ over [..., T] batches; returns an array of scores."""
    ref = np.asarray(ref)
    deg = np.asarray(deg)
    flat_r = ref.reshape(-1, ref.shape[-1])
    flat_d = deg.reshape(-1, deg.shape[-1])
    out = np.asarray(
        [pesq(r, d, sample_rate) for r, d in zip(flat_r, flat_d)]
    )
    return out.reshape(ref.shape[:-1])
