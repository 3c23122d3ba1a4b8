"""Reference parity for the remaining model families (small configs).

Same contract as test_reference_parity: identical weights + input → same
waveforms within float tolerance, reference imported from /root/reference
(skipped when absent).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_PATH = "/root/reference"


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


@pytest.fixture(scope="module")
def ref_models():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import look2hear.models as ref_models

        return ref_models
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def sd_of(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def run_both(ref, ours, params, x, atol=1e-3):
    import jax.numpy as jnp

    from parity_utils import assert_waveform_parity, torch_forward_f64

    want = torch_forward_f64(ref, x)
    got = np.asarray(ours.apply(params, jnp.asarray(x)))
    assert_waveform_parity(got, want, atol=atol)


class TestDPTNetParity:
    def test_tasnet_dptnet(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import TasNet
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            enc_dim=16, bn_dim=16, hidden_dim=16, win=16, layer=2, num_spk=2,
            module="DPTNet", group_size=1, block_size=20, sample_rate=8000,
            unfold=False,
        )
        ref = ref_models.TasNet(**kw)
        x = rng.normal(size=(1, 1600)).astype(np.float32)
        params = convert("TasNetDPTNet", sd_of(ref), layer=2)
        run_both(ref, TasNet(**kw), params, x)


class TestBSRNNParity:
    def test_bsrnn(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import BSRNN
        from audio_only_speech_separation_tpu.models.bsrnn import compute_band_widths
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            win=256, stride=64, feature_dim=8, num_spks=2, num_layer=1,
            num_repeat=2, context=0, dropout=0.0, bi_comm=True, sample_rate=8000,
        )
        ref = ref_models.BSRNN(**kw)
        nband = len(compute_band_widths(8000, 129))
        x = rng.normal(size=(1, 2000)).astype(np.float32)
        params = convert("BSRNN", sd_of(ref), nband=nband, num_repeat=2, num_layer=1)
        run_both(ref, BSRNN(**kw), params, x)

    def test_bsrnn_with_context(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import BSRNN
        from audio_only_speech_separation_tpu.models.bsrnn import compute_band_widths
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            win=256, stride=64, feature_dim=8, num_spks=2, num_layer=1,
            num_repeat=1, context=1, dropout=0.0, bi_comm=True, sample_rate=8000,
        )
        ref = ref_models.BSRNN(**kw)
        nband = len(compute_band_widths(8000, 129))
        x = rng.normal(size=(1, 1600)).astype(np.float32)
        params = convert("BSRNN", sd_of(ref), nband=nband, num_repeat=1)
        run_both(ref, BSRNN(**kw), params, x)


class TestSepformerParity:
    def test_sepformer(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import Sepformer
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            encoder_kernel_size=16, encoder_out_nchannels=16,
            masknet_chunksize=20, masknet_numlayers=2,
            intra_numlayers=2, inter_numlayers=2,
            intra_nhead=4, inter_nhead=4, intra_dffn=32, inter_dffn=32,
            sample_rate=8000,
        )
        ref = ref_models.Sepformer(**kw)
        x = rng.normal(size=(1, 1600)).astype(np.float32)
        params = convert(
            "Sepformer", sd_of(ref), masknet_numlayers=2,
            intra_numlayers=2, inter_numlayers=2,
        )
        run_both(ref, Sepformer(**kw), params, x)


class TestTDANetParity:
    def test_tdanet(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import TDANet
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            out_channels=16, in_channels=16, num_blocks=2, upsampling_depth=4,
            enc_kernel_size=4, num_sources=2, sample_rate=8000,
        )
        ref = ref_models.TDANet(**kw)
        x = rng.normal(size=(2, 1600)).astype(np.float32)
        params = convert("TDANet", sd_of(ref), upsampling_depth=4)
        run_both(ref, TDANet(**kw), params, x)


class TestAFRCNNParity:
    def test_afrcnn(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import AFRCNN
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            out_channels=16, in_channels=16, num_blocks=2, upsampling_depth=4,
            enc_kernel_size=4, num_sources=2, sample_rate=8000,
        )
        ref = ref_models.AFRCNN(**kw)
        x = rng.normal(size=(1, 1600)).astype(np.float32)
        params = convert("AFRCNN", sd_of(ref), upsampling_depth=4)
        run_both(ref, AFRCNN(**kw), params, x)


class TestDPRNNTasNetParity:
    def test_dprnn_old(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import DPRNNTasNet
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            feature_dim=16, hidden_dim=16, win=4, layer=2, segment_size=16,
            num_spk=2, sample_rate=8000,
        )
        ref = ref_models.DPRNNTasNet(**kw)
        x = rng.normal(size=(1, 1600)).astype(np.float32)
        params = convert("DPRNNTasNet", sd_of(ref), layer=2)
        run_both(ref, DPRNNTasNet(**kw), params, x)


class TestSandglassetParity:
    def test_sandglasset(self, ref_models, rng):
        from audio_only_speech_separation_tpu.models import Sandglasset
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            n_feats=16, bn_chan=16, hid_size=16, chunk_size=32, n_repeats=2,
            n_head=4, kernel_size=4, sr=8000,
        )
        ref = ref_models.Sandglasset(**kw)
        x = rng.normal(size=(1, 800)).astype(np.float32)
        params = convert("Sandglasset", sd_of(ref), n_repeats=2)
        ours = Sandglasset(sample_rate=8000, **kw)
        run_both(ref, ours, params, x)
