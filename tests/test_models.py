"""Model shape/dtype contract tests (SURVEY.md §4 item 1).

Every model maps [B, T] → [B, n_src, T] with matching T, and passes 1-D
input through with the batch axis squeezed.  Tiny hyperparameters keep
single-core CPU compile times tolerable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audio_only_speech_separation_tpu.models as M


def build_and_run(model, T=640, batch=2, seed=0):
    x = jnp.asarray(np.random.default_rng(seed).normal(size=(batch, T)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    return x, params, out


TINY_TASNET = dict(
    enc_dim=16, bn_dim=16, hidden_dim=16, win=16, layer=1, num_spk=2,
    block_size=20, sample_rate=8000,
)


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestTasNetFamily:
    @pytest.mark.parametrize("module", ["DPRNN", "DPTNet"])
    def test_dual_path_modules(self, module):
        model = M.TasNet(module=module, **TINY_TASNET)
        x, _, out = build_and_run(model, T=400)
        assert out.shape == (2, 2, 400)

    def test_tcn_module(self):
        model = M.TasNet(module="TCN", layer=2, **{k: v for k, v in TINY_TASNET.items() if k != "layer"})
        x, _, out = build_and_run(model, T=400)
        assert out.shape == (2, 2, 400)

    def test_sudormrf_module(self):
        model = M.TasNet(module="SudoRMRF", **TINY_TASNET)
        x, _, out = build_and_run(model, T=512)
        assert out.shape == (2, 2, 512)

    def test_groupcomm_dprnn(self):
        model = M.TasNet(module="DPRNN", group_size=2, context_size=8, **{k: v for k, v in TINY_TASNET.items() if k != "block_size"}, block_size=10)
        x, _, out = build_and_run(model, T=400)
        assert out.shape == (2, 2, 400)

    def test_unfold_shares_weights(self):
        model = M.TasNet(module="DPRNN", unfold=True, **{**TINY_TASNET, "layer": 2})
        x = jnp.zeros((1, 200))
        params = model.init(jax.random.PRNGKey(0), x)
        names = jax.tree_util.tree_leaves_with_path(params)
        keys = {"/".join(str(p) for p in path) for path, _ in names}
        # shared row rnn appears once, no per-layer copies
        assert any("row_rnn_shared" in k for k in keys)
        assert not any("row_rnn_0" in k for k in keys)

    def test_one_d_passthrough(self):
        model = M.TasNet(module="DPRNN", **TINY_TASNET)
        x = jnp.zeros((320,))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 320)


class TestConvTasNet:
    @pytest.mark.slow
    def test_shape(self):
        model = M.ConvTasNet(N=32, L=16, B=16, H=16, P=3, X=2, R=1, num_spks=3, sample_rate=8000)
        x, _, out = build_and_run(model, T=800)
        assert out.shape == (2, 3, 800)

    def test_sigmoid_mask(self):
        model = M.ConvTasNet(N=16, L=8, B=8, H=8, X=1, R=1, activate="sigmoid", num_spks=2, sample_rate=8000)
        x, _, out = build_and_run(model, T=320)
        assert out.shape == (2, 2, 320)


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestBSRNN:
    def test_shape(self):
        model = M.BSRNN(win=256, stride=64, feature_dim=8, num_spks=2, num_repeat=1, sample_rate=8000)
        x, _, out = build_and_run(model, T=2000, batch=1)
        assert out.shape == (1, 2, 2000)

    def test_band_widths_partition(self):
        from audio_only_speech_separation_tpu.models.bsrnn import compute_band_widths

        bw = compute_band_widths(8000, 129)
        assert sum(bw) == 129 and all(b > 0 for b in bw)
        bw16 = compute_band_widths(16000, 129)
        assert sum(bw16) == 129


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestSepformer:
    def test_shape(self):
        model = M.Sepformer(
            encoder_kernel_size=16,
            encoder_out_nchannels=16,
            masknet_chunksize=20,
            masknet_numlayers=1,
            intra_numlayers=1,
            inter_numlayers=1,
            intra_nhead=4,
            inter_nhead=4,
            intra_dffn=32,
            inter_dffn=32,
        )
        x, _, out = build_and_run(model, T=800, batch=1)
        assert out.shape == (1, 2, 800)


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestTDANet:
    def test_shape(self):
        model = M.TDANet(
            out_channels=16, in_channels=16, num_blocks=2, upsampling_depth=4,
            enc_kernel_size=4, num_sources=2, sample_rate=8000,
        )
        x, _, out = build_and_run(model, T=1600, batch=1)
        assert out.shape == (1, 2, 1600)


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestAFRCNN:
    def test_shape(self):
        model = M.AFRCNN(
            out_channels=16, in_channels=16, num_blocks=2, upsampling_depth=4,
            enc_kernel_size=4, num_sources=2, sample_rate=8000,
        )
        x, _, out = build_and_run(model, T=1600, batch=1)
        assert out.shape == (1, 2, 1600)


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestDPRNNTasNet:
    def test_shape(self):
        model = M.DPRNNTasNet(
            feature_dim=16, hidden_dim=16, win=4, layer=1, segment_size=16,
            num_spk=2, sample_rate=8000,
        )
        x, _, out = build_and_run(model, T=800, batch=1)
        assert out.shape == (1, 2, 800)


@pytest.mark.slow  # multi-second forward builds: excluded from `make test-fast`
class TestSandglasset:
    def test_shape(self):
        model = M.Sandglasset(
            n_feats=16, bn_chan=16, hid_size=16, chunk_size=32, n_repeats=2,
            n_head=4, kernel_size=4, sr=8000, sample_rate=8000,
        )
        x, _, out = build_and_run(model, T=800, batch=1)
        assert out.shape == (1, 2, 800)


class TestSerialization:
    @pytest.mark.slow
    def test_round_trip(self, tmp_path):
        model = M.TasNet(module="DPRNN", **TINY_TASNET)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 200)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        conf = M.serialize(model, params)
        assert conf["model_name"] == "TasNet"
        assert conf["model_args"]["enc_dim"] == 16
        path = str(tmp_path / "best_model.pth")
        M.save_serialized(conf, path)
        model2, params2 = M.from_pretrain(path)
        out1 = model.apply(params, x)
        out2 = model2.apply(params2, x)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)

    def test_registry_get(self):
        assert M.get("TasNet") is M.TasNet
        with pytest.raises(KeyError):
            M.get("NoSuchModel")
