"""Loss golden tests vs the reference formulas (SURVEY.md §4 item 2).

Where torch is available we cross-check against an independent numpy
re-derivation of the reference formulas (not the reference code).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_only_speech_separation_tpu.losses import (
    MixITLossWrapper,
    PITLossWrapper,
    PairwiseNegSDR,
    multisrc_neg_snr,
    pairwise_neg_sisdr,
    pairwise_neg_snr,
    singlesrc_neg_sisdr,
)
from audio_only_speech_separation_tpu.losses.pit import (
    find_best_perm,
    hungarian_best_perm,
    reorder_sources,
)

EPS = 1e-8


def np_pairwise_neg_sisdr(ests, targets):
    """Independent numpy re-derivation of pairwise −SI-SDR."""
    t = targets - targets.mean(-1, keepdims=True)
    e = ests - ests.mean(-1, keepdims=True)
    s_t = t[:, None, :, :]
    s_e = e[:, :, None, :]
    dot = np.sum(s_e * s_t, -1, keepdims=True)
    energy = np.sum(s_t**2, -1, keepdims=True) + EPS
    proj = dot * s_t / energy
    noise = s_e - proj
    ratio = np.sum(proj**2, -1) / (np.sum(noise**2, -1) + EPS)
    return -10 * np.log10(ratio + EPS)


class TestNegSDR:
    def test_pairwise_sisdr_matches_numpy(self, rng):
        ests = rng.normal(size=(3, 2, 800)).astype(np.float32)
        tgts = rng.normal(size=(3, 2, 800)).astype(np.float32)
        got = np.asarray(pairwise_neg_sisdr(jnp.asarray(ests), jnp.asarray(tgts)))
        want = np_pairwise_neg_sisdr(ests, tgts)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_perfect_estimate_is_very_negative(self, rng):
        tgts = rng.normal(size=(1, 2, 1000)).astype(np.float32)
        loss = np.asarray(pairwise_neg_sisdr(jnp.asarray(tgts), jnp.asarray(tgts)))
        # diagonal (matched pairs) should be ≈ -80 dB (limited by EPS)
        assert loss[0, 0, 0] < -50 and loss[0, 1, 1] < -50

    def test_snr_scale_sensitivity(self, rng):
        # SNR (not scale-invariant) must punish scaling; SI-SDR must not
        tgts = rng.normal(size=(1, 2, 500)).astype(np.float32)
        scaled = 0.5 * tgts
        snr = np.asarray(pairwise_neg_snr(jnp.asarray(scaled), jnp.asarray(tgts)))
        sisdr = np.asarray(pairwise_neg_sisdr(jnp.asarray(scaled), jnp.asarray(tgts)))
        assert snr[0, 0, 0] > -10  # bad score
        assert sisdr[0, 0, 0] < -50  # still near-perfect

    def test_matches_torch_reference_formula(self, rng):
        torch = pytest.importorskip("torch")
        ests = rng.normal(size=(2, 3, 640)).astype(np.float32)
        tgts = rng.normal(size=(2, 3, 640)).astype(np.float32)
        te, tt = torch.from_numpy(ests), torch.from_numpy(tgts)
        # torch re-derivation (mirrors reference matrix.py:22-57)
        tt0 = tt - tt.mean(2, keepdim=True)
        te0 = te - te.mean(2, keepdim=True)
        s_t, s_e = tt0.unsqueeze(1), te0.unsqueeze(2)
        dot = (s_e * s_t).sum(3, keepdim=True)
        energy = (s_t**2).sum(3, keepdim=True) + EPS
        proj = dot * s_t / energy
        ratio = (proj**2).sum(3) / ((s_e - proj) ** 2).sum(3).add(EPS)
        want = (-10 * torch.log10(ratio + EPS)).numpy()
        got = np.asarray(pairwise_neg_sisdr(jnp.asarray(ests), jnp.asarray(tgts)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_singlesrc_shape(self, rng):
        x = rng.normal(size=(4, 300)).astype(np.float32)
        y = rng.normal(size=(4, 300)).astype(np.float32)
        out = singlesrc_neg_sisdr(jnp.asarray(x), jnp.asarray(y))
        assert out.shape == (4,)

    def test_multisrc_shape(self, rng):
        x = rng.normal(size=(4, 2, 300)).astype(np.float32)
        y = rng.normal(size=(4, 2, 300)).astype(np.float32)
        out = multisrc_neg_snr(jnp.asarray(x), jnp.asarray(y))
        assert out.shape == (4,)


class TestPIT:
    def test_permutation_invariance(self, rng):
        ests = rng.normal(size=(2, 3, 400)).astype(np.float32)
        tgts = rng.normal(size=(2, 3, 400)).astype(np.float32)
        pit = PITLossWrapper(pairwise_neg_sisdr, threshold_byloss=False)
        l1 = float(pit(jnp.asarray(ests), jnp.asarray(tgts)))
        l2 = float(pit(jnp.asarray(ests[:, [2, 0, 1]]), jnp.asarray(tgts)))
        np.testing.assert_allclose(l1, l2, rtol=1e-5)

    def test_finds_correct_permutation(self, rng):
        tgts = rng.normal(size=(1, 2, 600)).astype(np.float32)
        ests = tgts[:, [1, 0]] + 0.01 * rng.normal(size=(1, 2, 600)).astype(np.float32)
        pit = PITLossWrapper(pairwise_neg_sisdr, threshold_byloss=False)
        loss, reordered = pit(jnp.asarray(ests), jnp.asarray(tgts), return_ests=True)
        assert float(loss) < -20
        # reordered estimates must be in target order
        np.testing.assert_allclose(
            np.asarray(reordered), ests[:, [1, 0]], rtol=1e-6
        )

    def test_factorial_agrees_with_hungarian(self, rng):
        pwl = rng.normal(size=(5, 4, 4)).astype(np.float32)
        min_f, idx_f = find_best_perm(jnp.asarray(pwl))
        min_h, idx_h = hungarian_best_perm(pwl)
        np.testing.assert_allclose(np.asarray(min_f), min_h, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx_f), idx_h)

    def test_threshold_byloss(self):
        # items below -30 are dropped from the mean when any survive
        pwl_good = jnp.asarray(np.diag([-5.0, -7.0])[None], jnp.float32)

        class FakeLoss:
            def __call__(self, e, t):
                return jnp.asarray(
                    [np.diag([-5.0, -7.0]), np.diag([-50.0, -60.0])], jnp.float32
                )

        pit = PITLossWrapper(FakeLoss(), threshold_byloss=True)
        dummy = jnp.zeros((2, 2, 10))
        loss = float(pit(dummy, dummy))
        np.testing.assert_allclose(loss, -6.0, rtol=1e-6)  # only batch 0 kept

    def test_perm_avg_mode(self, rng):
        tgts = rng.normal(size=(2, 2, 300)).astype(np.float32)
        ests = tgts[:, [1, 0]]
        pit = PITLossWrapper(multisrc_neg_snr, pit_from="perm_avg")
        loss = float(pit(jnp.asarray(ests), jnp.asarray(tgts)))
        assert loss < -40  # perfect under swap

    def test_pw_pt_mode_matches_pw_mtx(self, rng):
        ests = rng.normal(size=(2, 2, 256)).astype(np.float32)
        tgts = rng.normal(size=(2, 2, 256)).astype(np.float32)
        m1 = PITLossWrapper(pairwise_neg_sisdr, pit_from="pw_mtx", threshold_byloss=False)
        m2 = PITLossWrapper(singlesrc_neg_sisdr, pit_from="pw_pt", threshold_byloss=False)
        np.testing.assert_allclose(
            float(m1(jnp.asarray(ests), jnp.asarray(tgts))),
            float(m2(jnp.asarray(ests), jnp.asarray(tgts))),
            rtol=1e-4,
        )


class TestMixIT:
    def test_recovers_partition(self, rng):
        srcs = rng.normal(size=(1, 4, 500)).astype(np.float32)
        mixes = np.stack([srcs[:, 0] + srcs[:, 2], srcs[:, 1] + srcs[:, 3]], axis=1)
        wrapper = MixITLossWrapper(multisrc_neg_snr, generalized=True)
        loss, est_mixes = wrapper(
            jnp.asarray(srcs), jnp.asarray(mixes), return_est=True
        )
        assert float(loss) < -40
        np.testing.assert_allclose(np.asarray(est_mixes), mixes, rtol=1e-4, atol=1e-5)

    def test_equal_partition_mode(self, rng):
        srcs = rng.normal(size=(2, 4, 300)).astype(np.float32)
        mixes = np.stack([srcs[:, 0] + srcs[:, 1], srcs[:, 2] + srcs[:, 3]], axis=1)
        wrapper = MixITLossWrapper(multisrc_neg_snr, generalized=False)
        loss = float(wrapper(jnp.asarray(srcs), jnp.asarray(mixes)))
        assert loss < -40
