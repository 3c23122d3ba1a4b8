"""Reference parity at the EXACT published config dimensions.

The toy-scale parity suite (test_reference_parity*.py) pins the math at
reduced dims; this suite instantiates each family at the real shapes from
`configs/*.yml` (round-3 verdict weak #2: band partitions at
feature_dim=128, 6-layer dual-path stacks, Sepformer 8+8 layers at d=256,
and K=250 chunk counts were unexercised).  Same contract: reference
weights imported via utils/torch_import, f64 torch forward vs our f32
forward, aggregate SNR + elementwise tolerance (tests/parity_utils.py).

Inputs are kept short (0.2-1.0 s) so the f64 CPU reference stays tractable,
but long enough that every structural regime is live: ConvTasNet sees more
than 2x its 128-sample max dilation, Sepformer/Sandglasset produce multiple
K=250 chunks, BSRNN spans all 31 bands of the 8 kHz partition.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_PATH = "/root/reference"

pytestmark = pytest.mark.slow  # full-size forwards: minutes, not seconds


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


def run_both(ref, ours, params, x, atol=2e-3, rtol=2e-3, min_snr_db=50.0):
    import jax
    import jax.numpy as jnp

    from parity_utils import assert_waveform_parity, torch_forward_f64

    want = torch_forward_f64(ref, x)
    got = np.asarray(jax.jit(ours.apply)(params, jnp.asarray(x)))
    assert_waveform_parity(got, want, atol=atol, rtol=rtol, min_snr_db=min_snr_db)


def test_convtasnet_lrs3_full_size(ref_models, rng):
    """configs/convtasnet_lrs3.yml: N=512 L=16 B=128 H=512 P=3 X=8 R=3,
    3 speakers, 16 kHz (reference look2hear/models/convtasnet.py:148-219)."""
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        N=512, L=16, B=128, H=512, P=3, X=8, R=3, norm="gLN", num_spks=3,
        activate="relu", causal=False,
    )
    ref = ref_models.ConvTasNet(sample_rate=16000, **kw)
    # > 2x the max receptive field (dilation 128 * L): full dilation regime
    x = rng.normal(size=(1, 8000)).astype(np.float32)
    params = convert("ConvTasNet", sd_of(ref), X=8, R=3)
    run_both(ref, ConvTasNet(sample_rate=16000, **kw), params, x)


@pytest.mark.parametrize("module", ["DPRNN", "DPTNet"])
def test_tasnet_wsj0_full_size(ref_models, rng, module):
    """configs/{dprnn,dptnet}_wsj0.yml: enc 64 / bn 64 / hidden 128,
    layer=6, block_size=100, 8 kHz (reference gc3_network.py:8-106)."""
    from audio_only_speech_separation_tpu.models import TasNet
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        enc_dim=64, bn_dim=64, hidden_dim=128, win=16, layer=6, num_spk=2,
        module=module, group_size=1, block_size=100, unfold=False,
        sample_rate=8000,
    )
    ref = ref_models.TasNet(**kw)
    # 1 s @ 8 kHz -> ~1000 enc frames -> ~20 K=100 chunks per dual-path pass
    x = rng.normal(size=(1, 8000)).astype(np.float32)
    name = "TasNet" if module == "DPRNN" else "TasNetDPTNet"
    params = convert(name, sd_of(ref), layer=6)
    run_both(ref, TasNet(**kw), params, x)


def test_bsrnn_wsj0_full_size(ref_models, rng):
    """configs/bsrnn_wsj0.yml: feature_dim=128, num_repeat=8, win=256,
    stride=64, 8 kHz (reference look2hear/models/bsrnn.py:63-242)."""
    from audio_only_speech_separation_tpu.models import BSRNN
    from audio_only_speech_separation_tpu.models.bsrnn import compute_band_widths
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        win=256, stride=64, feature_dim=128, num_spks=2, num_layer=1,
        num_repeat=8, context=0, dropout=0.0, bi_comm=True, sample_rate=8000,
    )
    ref = ref_models.BSRNN(**kw)
    nband = len(compute_band_widths(8000, 129))
    x = rng.normal(size=(1, 8000)).astype(np.float32)
    params = convert("BSRNN", sd_of(ref), nband=nband, num_repeat=8, num_layer=1)
    run_both(ref, BSRNN(**kw), params, x)


def test_sepformer_base_full_size(ref_models, rng):
    """configs/sepformer_base.yml: d=256, 8+8 transformer layers, 8 heads,
    dffn=1024, chunk 250 (reference look2hear/models/sepformer.py:849-1020)."""
    from audio_only_speech_separation_tpu.models import Sepformer
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        encoder_kernel_size=16, encoder_in_nchannels=1,
        encoder_out_nchannels=256, masknet_chunksize=250, masknet_numlayers=2,
        masknet_norm="gLN", masknet_numspks=2,
        intra_numlayers=8, inter_numlayers=8, intra_nhead=8, inter_nhead=8,
        intra_dffn=1024, inter_dffn=1024,
        intra_use_positional=True, inter_use_positional=True,
        intra_norm_before=True, inter_norm_before=True,
        intra_causal=False, inter_causal=False, sample_rate=8000,
    )
    ref = ref_models.Sepformer(**kw)
    # 0.75 s @ 8 kHz -> 750 enc frames -> 5 chunks of K=250 at 50% overlap
    x = rng.normal(size=(1, 6000)).astype(np.float32)
    params = convert(
        "Sepformer", sd_of(ref), masknet_numlayers=2,
        intra_numlayers=8, inter_numlayers=8,
    )
    run_both(ref, Sepformer(**kw), params, x, min_snr_db=45.0)


def test_tdanet_lrs2_full_size(ref_models, rng):
    """configs/tdanet_lrs2.yml: out=128, in=512, 16 shared blocks, depth 5,
    16 kHz (reference look2hear/models/tdanet.py:371-526)."""
    from audio_only_speech_separation_tpu.models import TDANet
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        out_channels=128, in_channels=512, num_blocks=16, upsampling_depth=5,
        enc_kernel_size=4, num_sources=2, sample_rate=16000,
    )
    ref = ref_models.TDANet(**kw)
    x = rng.normal(size=(1, 4800)).astype(np.float32)
    params = convert("TDANet", sd_of(ref), upsampling_depth=5)
    # 16 weight-shared iterations accumulate f32 noise; SNR still separates
    # cleanly from any logic bug (<20 dB)
    run_both(ref, TDANet(**kw), params, x, min_snr_db=45.0)


def test_afrcnn_lrs2_full_size(ref_models, rng):
    """configs/afrcnn_lrs2.yml: out=512, in=512, 16 shared blocks, depth 5,
    enc_kernel_size=1, 16 kHz (reference look2hear/models/afrcnn.py:246-363)."""
    from audio_only_speech_separation_tpu.models import AFRCNN
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        out_channels=512, in_channels=512, num_blocks=16, upsampling_depth=5,
        enc_kernel_size=1, num_sources=2, sample_rate=16000,
    )
    ref = ref_models.AFRCNN(**kw)
    # the most FLOP-hungry family (420 GFLOP/audio-sec): keep the clip short
    x = rng.normal(size=(1, 3200)).astype(np.float32)
    params = convert("AFRCNN", sd_of(ref), upsampling_depth=5)
    run_both(ref, AFRCNN(**kw), params, x, min_snr_db=45.0)


def test_sandglasset_published_defaults(ref_models, rng):
    """Sandglasset at its published ctor defaults (reference
    sandglasset.py:262-283): n_feats=64, bn=128, hid=128, chunk 250/hop 125,
    6 blocks, 8 heads, kernel 2."""
    from audio_only_speech_separation_tpu.models import Sandglasset
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    kw = dict(
        n_feats=64, bn_chan=128, hid_size=128, chunk_size=250, n_repeats=6,
        n_head=8, kernel_size=2, sr=16000,
    )
    ref = ref_models.Sandglasset(**kw)
    # kernel 2 / stride 1: 3200 samples -> ~3200 frames -> ~25 K=250 chunks
    x = rng.normal(size=(1, 3200)).astype(np.float32)
    params = convert("Sandglasset", sd_of(ref), n_repeats=6)
    ours = Sandglasset(sample_rate=16000, **kw)
    run_both(ref, ours, params, x, min_snr_db=45.0)
