"""Profiling utils + layer library + separator helpers tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestProfiling:
    @pytest.mark.slow
    def test_count_params_and_cost(self):
        from audio_only_speech_separation_tpu.models import ConvTasNet
        from audio_only_speech_separation_tpu.utils.profiling import (
            count_params,
            estimate_cost,
        )

        model = ConvTasNet(N=16, L=8, B=8, H=8, X=1, R=1, num_spks=2, sample_rate=8000)
        x = jnp.zeros((1, 800))
        params = model.init(jax.random.PRNGKey(0), x)
        n = count_params(params)
        assert n > 500
        cost = estimate_cost(lambda p, m: model.apply(p, m), params, x)
        assert cost.get("flops", 0) > 0

    def test_step_timer(self):
        from audio_only_speech_separation_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(3):
            t.start()
            t.stop()
        assert t.mean >= 0 and t.p50 >= 0


class TestLayersLibrary:
    def test_make_enc_dec_round_trip_shapes(self):
        from audio_only_speech_separation_tpu.layers import make_enc_dec

        enc, dec = make_enc_dec("free", n_filters=32, kernel_size=16, stride=8)
        x = jnp.zeros((2, 1600))
        pe = enc.init(jax.random.PRNGKey(0), x)
        spec = enc.apply(pe, x)
        assert spec.shape[1] == 32
        pd = dec.init(jax.random.PRNGKey(1), spec)
        wav = dec.apply(pd, spec)
        assert wav.shape[0] == 2

    def test_conv1d_block(self):
        from audio_only_speech_separation_tpu.layers import Conv1DBlock

        blk = Conv1DBlock(in_chan=16, hid_chan=32, dilation=2)
        x = jnp.zeros((1, 16, 100))
        p = blk.init(jax.random.PRNGKey(0), x)
        res, skip = blk.apply(p, x)
        assert res.shape == x.shape and skip.shape == x.shape

    def test_frcnn_block(self):
        from audio_only_speech_separation_tpu.layers import FRCNNBlock

        blk = FRCNNBlock(out_channels=16, in_channels=16, upsampling_depth=3)
        x = jnp.zeros((1, 16, 160))
        p = blk.init(jax.random.PRNGKey(0), x)
        assert blk.apply(p, x).shape == x.shape

    def test_dprnn_stack(self):
        from audio_only_speech_separation_tpu.layers import DPRNN

        m = DPRNN(hidden_size=8, n_repeats=1, out_channels=24)
        x = jnp.zeros((1, 12, 10, 6))
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == (1, 24, 10, 6)

    def test_transformer_block(self):
        from audio_only_speech_separation_tpu.layers import TransformerBlockTF

        m = TransformerBlockTF(d_model=16, n_head=4, d_ffn=32)
        x = jnp.zeros((2, 9, 16))
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == x.shape


class TestSeparator:
    def test_energy_renormalization(self, rng):
        from audio_only_speech_separation_tpu.models import ConvTasNet
        from audio_only_speech_separation_tpu.utils.separator import separate

        model = ConvTasNet(N=16, L=8, B=8, H=8, X=1, R=1, num_spks=2, sample_rate=8000)
        x = rng.normal(size=(1, 800)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        out = separate(model, params, x)
        assert isinstance(out, np.ndarray)
        # energy renormalization: Σ|out| == Σ|in|
        np.testing.assert_allclose(np.abs(out).sum(), np.abs(x).sum(), rtol=1e-3)

    def test_wav_file_separate(self, rng, tmp_path):
        from audio_only_speech_separation_tpu.data.audio_io import read_wav, write_wav
        from audio_only_speech_separation_tpu.models import ConvTasNet
        from audio_only_speech_separation_tpu.utils.separator import wav_file_separate

        model = ConvTasNet(N=16, L=8, B=8, H=8, X=1, R=1, num_spks=2, sample_rate=8000)
        x = (rng.normal(size=1600) * 0.1).astype(np.float32)
        inp = str(tmp_path / "in.wav")
        write_wav(inp, x, 8000)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[None]))
        paths = wav_file_separate(model, params, inp, str(tmp_path / "out"), 8000)
        assert len(paths) == 2
        for p in paths:
            assert len(read_wav(p)) == 1600


class TestAVLayers:
    def test_video1dconv(self):
        from audio_only_speech_separation_tpu.layers import Video1DConv

        m = Video1DConv(in_chan=8, out_chan=16, kernel_size=3, first_block=True)
        x = jnp.zeros((2, 8, 50))
        p = m.init(jax.random.PRNGKey(0), x)
        skip, y = m.apply(p, x)
        assert skip.shape == (2, 16, 50) and y.shape == (2, 8, 50)

    def test_concat_fusion(self):
        from audio_only_speech_separation_tpu.layers import Concat

        m = Concat(ain_chan=8, vin_chan=4, out_chan=16)
        a = jnp.zeros((1, 8, 100))
        v = jnp.zeros((1, 4, 25))
        p = m.init(jax.random.PRNGKey(0), a, v)
        assert m.apply(p, a, v).shape == (1, 16, 100)

    def test_bottomup_topdown(self):
        from audio_only_speech_separation_tpu.layers import BottomupConcatTopdown

        m = BottomupConcatTopdown(in_chan=8, out_chan=16, upsampling_depth=3)
        x = jnp.zeros((1, 8, 80))
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == x.shape

    def test_conformer_pieces(self):
        from audio_only_speech_separation_tpu.layers import (
            ConformerConvModule,
            MultiHeadedSelfAttentionModule,
        )

        x = jnp.zeros((2, 20, 16))
        attn = MultiHeadedSelfAttentionModule(d_model=16, num_heads=4)
        p = attn.init(jax.random.PRNGKey(0), x)
        assert attn.apply(p, x).shape == x.shape
        conv = ConformerConvModule(in_channels=16, kernel_size=7)
        p2 = conv.init(jax.random.PRNGKey(1), x)
        assert conv.apply(p2, x).shape == x.shape

    def test_dprnn_linear(self):
        from audio_only_speech_separation_tpu.layers import DPRNNLinear

        m = DPRNNLinear(hidden_size=8)
        x = jnp.zeros((1, 12, 10, 6))
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == x.shape
