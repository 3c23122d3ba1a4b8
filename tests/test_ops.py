"""Unit tests for the TPU ops layer (SURVEY.md §4 test strategy items 3-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_only_speech_separation_tpu.ops import (
    BiLSTM,
    ConvDecoder,
    ConvEncoder,
    CumulativeLayerNorm,
    FrameLayerNorm,
    GlobalLayerNorm,
    LSTM,
    ProjRNN,
    istft,
    merge_feature,
    split_feature,
    stft,
)
from audio_only_speech_separation_tpu.ops.conv import frame_signal, overlap_add
from audio_only_speech_separation_tpu.ops.stft import hann_window, stft_matmul


class TestChunk:
    def test_round_trip_doubles(self):
        # merge(split(x)) == 2x: every sample is covered by two 50% chunks
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 517)), jnp.float32)
        blocks, rest = split_feature(x, 100)
        assert blocks.shape[:3] == (2, 3, 100)
        merged = merge_feature(blocks, rest)
        np.testing.assert_allclose(np.asarray(merged), 2 * np.asarray(x), rtol=1e-6)

    def test_exact_multiple_pads_full_block(self):
        # reference quirk: rest is never 0 — an exact multiple still pads a
        # full extra block (gc3_basics.py:68: rest ∈ [1, block_size])
        x = jnp.ones((1, 2, 150), jnp.float32)  # stride=50, 150+50 = 2*100
        blocks, rest = split_feature(x, 100)
        assert rest == 100
        merged = merge_feature(blocks, rest)
        assert merged.shape == x.shape
        np.testing.assert_allclose(np.asarray(merged), 2 * np.asarray(x), rtol=1e-6)

    def test_matches_torch_reference_layout(self):
        # cross-check against the reference algorithm re-run in numpy
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 4, 237)).astype(np.float32)
        block, stride = 10, 5
        rest = block - (stride + x.shape[-1] % block) % block
        padded = np.pad(x, ((0, 0), (0, 0), (stride, stride + rest)))
        b1 = padded[:, :, :-stride].reshape(1, 4, -1, block)
        b2 = padded[:, :, stride:].reshape(1, 4, -1, block)
        want = np.concatenate([b1, b2], axis=3).reshape(1, 4, -1, block)
        want = np.swapaxes(want, 2, 3)
        got, got_rest = split_feature(jnp.asarray(x), block)
        assert got_rest == rest
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


class TestFraming:
    @pytest.mark.parametrize("win,stride", [(16, 8), (256, 64), (7, 3)])
    def test_frame_signal(self, win, stride):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 400)).astype(np.float32)
        frames = np.asarray(frame_signal(jnp.asarray(x), win, stride))
        n = (400 - win) // stride + 1
        assert frames.shape == (2, n, win)
        for i in range(0, n, max(1, n // 5)):
            np.testing.assert_allclose(frames[:, i], x[:, i * stride : i * stride + win])

    @pytest.mark.parametrize("win,stride", [(16, 8), (12, 4)])
    def test_overlap_add_inverts_framing_energy(self, win, stride):
        x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 160)), jnp.float32)
        frames = frame_signal(x, win, stride)
        y = overlap_add(frames, stride)
        # interior samples are covered win/stride times
        r = win // stride
        interior = np.asarray(y)[0, win : 160 - win]
        np.testing.assert_allclose(interior, r * np.asarray(x)[0, win : 160 - win], rtol=1e-5)


class TestFramingAxis1:
    """Channels-last duals of frame_signal/overlap_add (Sandglasset CL
    chunking, round 5): must equal the 2-D forms applied per channel."""

    @pytest.mark.parametrize("win,stride", [(16, 8), (250, 125), (7, 3)])
    def test_frame_axis1_matches_frame_signal(self, win, stride):
        from audio_only_speech_separation_tpu.ops.conv import frame_axis1

        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 400, 5)).astype(np.float32)
        got = np.asarray(frame_axis1(jnp.asarray(x), win, stride))
        for d in range(5):
            want = np.asarray(frame_signal(jnp.asarray(x[:, :, d]), win, stride))
            np.testing.assert_allclose(got[:, :, :, d], want, rtol=1e-6)

    @pytest.mark.parametrize("win,stride", [(16, 8), (250, 125), (7, 3)])
    def test_overlap_add_axis1_matches_overlap_add(self, win, stride):
        from audio_only_speech_separation_tpu.ops.conv import overlap_add_axis1

        rng = np.random.default_rng(5)
        n = 9
        frames = rng.normal(size=(2, n, win, 3)).astype(np.float32)
        got = np.asarray(overlap_add_axis1(jnp.asarray(frames), stride))
        for d in range(3):
            want = np.asarray(
                overlap_add(jnp.asarray(frames[:, :, :, d]), stride)
            )
            np.testing.assert_allclose(got[:, :, d], want, rtol=1e-5, atol=1e-6)


class TestFilterbank:
    def test_encoder_decoder_shapes(self):
        enc = ConvEncoder(out_channels=64, win=16, stride=8)
        x = jnp.zeros((3, 32000))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        n = (32000 - 16) // 8 + 1
        assert y.shape == (3, 64, n)
        dec = ConvDecoder(in_channels=64, win=16, stride=8)
        dparams = dec.init(jax.random.PRNGKey(1), y)
        z = dec.apply(dparams, y)
        assert z.shape == (3, (n - 1) * 8 + 16)

    def test_encoder_matches_direct_conv(self):
        # framed matmul == conv1d
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 256)), jnp.float32)
        enc = ConvEncoder(out_channels=8, win=16, stride=8)
        params = enc.init(jax.random.PRNGKey(0), x)
        w = params["params"]["kernel"]  # [win, out]
        got = enc.apply(params, x)
        want = jax.lax.conv_general_dilated(
            x[:, None, :],
            jnp.asarray(w).T[:, None, :],  # [out, in, win]
            window_strides=(8,),
            padding="VALID",
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


class TestNorms:
    def test_gln_zero_mean_unit_var(self):
        x = jnp.asarray(np.random.default_rng(5).normal(2.0, 3.0, (4, 16, 50)), jnp.float32)
        m = GlobalLayerNorm(channels=16)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        np.testing.assert_allclose(y.reshape(4, -1).mean(1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.reshape(4, -1).std(1), 1.0, atol=1e-3)

    def test_gln_large_offset_robust(self):
        # shifted-data single-pass variance (advisor r2 #3): the naive
        # E[x²]−μ² form collapses when μ² ≫ var (offset 1e3, std 1e-2 →
        # cancellation ratio 1e10); the shifted form must still normalize.
        x = jnp.asarray(
            1000.0 + np.random.default_rng(7).normal(0, 1e-2, (2, 16, 400)),
            jnp.float32,
        )
        m = GlobalLayerNorm(channels=16)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        # std is the sharp check: the naive form collapses var to 0 here,
        # making std ≈ x/√eps ~ 1e5.  The mean carries inherent f32 input
        # quantization (≈1e-4 absolute at offset 1e3 → ≈1e-2 of std).
        np.testing.assert_allclose(y.reshape(2, -1).mean(1), 0.0, atol=3e-2)
        np.testing.assert_allclose(y.reshape(2, -1).std(1), 1.0, atol=1e-2)

    def test_frame_ln_per_frame(self):
        x = jnp.asarray(np.random.default_rng(6).normal(0, 5, (2, 32, 10)), jnp.float32)
        m = FrameLayerNorm(channels=32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-5)

    def test_cln_causal(self):
        # changing the future must not change past outputs
        rng = np.random.default_rng(7)
        x = rng.normal(size=(1, 8, 20)).astype(np.float32)
        m = CumulativeLayerNorm(channels=8)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y1 = np.asarray(m.apply(params, jnp.asarray(x)))
        x2 = x.copy()
        x2[:, :, 15:] += 100.0
        y2 = np.asarray(m.apply(params, jnp.asarray(x2)))
        np.testing.assert_allclose(y1[:, :, :15], y2[:, :, :15], rtol=1e-5)


class TestRNN:
    def test_lstm_shapes(self):
        m = LSTM(hidden_size=32)
        x = jnp.zeros((4, 10, 16))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (4, 10, 32)

    def test_bilstm_matches_two_unidirectional(self):
        # fwd half of BiLSTM == LSTM with the same weights
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 12, 8))
        bi = BiLSTM(hidden_size=16)
        params = bi.init(rng, x)
        y = bi.apply(params, x)
        assert y.shape == (2, 12, 32)
        p = params["params"]
        from audio_only_speech_separation_tpu.ops.rnn import lstm_scan

        fwd = lstm_scan(x, p["w_ih"][0], p["w_hh"][0], p["bias"][0])
        np.testing.assert_allclose(np.asarray(y[..., :16]), np.asarray(fwd), atol=1e-5)
        # bwd half == reversed LSTM on reversed input
        bwd = lstm_scan(x[:, ::-1], p["w_ih"][1], p["w_hh"][1], p["bias"][1])[:, ::-1]
        np.testing.assert_allclose(np.asarray(y[..., 16:]), np.asarray(bwd), atol=1e-5)

    def test_projrnn_output_width(self):
        m = ProjRNN(hidden_size=24, bidirectional=True)
        x = jnp.zeros((2, 7, 12))
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (2, 7, 12)


class TestSTFT:
    def test_round_trip(self):
        x = jnp.asarray(np.random.default_rng(8).normal(size=(2, 4096)), jnp.float32)
        win = hann_window(256)
        spec = stft(x, 256, 64, win)
        assert spec.shape == (2, 129, 4096 // 64 + 1)
        y = istft(spec, 256, 64, win, length=4096)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_matmul_path_matches_fft(self):
        x = jnp.asarray(np.random.default_rng(9).normal(size=(1, 1024)), jnp.float32)
        win = hann_window(256)
        spec = stft(x, 256, 64, win)
        re, im = stft_matmul(x, 256, 64, win)
        np.testing.assert_allclose(np.asarray(spec.real), np.asarray(re), atol=2e-3)
        np.testing.assert_allclose(np.asarray(spec.imag), np.asarray(im), atol=2e-3)

    def test_matches_torch_stft(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(10).normal(size=(1, 2048)).astype(np.float32)
        win = 256
        tspec = torch.stft(
            torch.from_numpy(x),
            n_fft=win,
            hop_length=64,
            window=torch.hann_window(win),
            return_complex=True,
        ).numpy()
        jspec = np.asarray(stft(jnp.asarray(x), win, 64, hann_window(win)))
        np.testing.assert_allclose(jspec.real, tspec.real, atol=1e-3)
        np.testing.assert_allclose(jspec.imag, tspec.imag, atol=1e-3)
