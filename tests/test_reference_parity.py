"""End-to-end numerical parity against the actual PyTorch reference.

Loads the reference implementation from /root/reference (read-only) when
present — skipped elsewhere.  Same weights, same input → same waveforms
within float tolerance (BASELINE.md parity goal).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_PATH = "/root/reference"


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


def _load_reference_models():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import look2hear.models as ref_models  # namespace package

        return ref_models
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


@pytest.fixture(scope="module")
def ref_models():
    return _load_reference_models()


def to_numpy_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


class TestConvTasNetParity:
    def test_same_weights_same_output(self, ref_models, rng):
        import jax.numpy as jnp

        from audio_only_speech_separation_tpu.models import ConvTasNet
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        from parity_utils import assert_waveform_parity, torch_forward_f64

        kw = dict(N=32, L=16, B=16, H=24, P=3, X=2, R=2, num_spks=2, sample_rate=8000)
        ref = ref_models.ConvTasNet(**kw)
        x = rng.normal(size=(2, 4000)).astype(np.float32)
        params = convert("ConvTasNet", to_numpy_sd(ref), X=2, R=2)
        want = torch_forward_f64(ref, x)

        ours = ConvTasNet(**kw)
        got = np.asarray(ours.apply(params, jnp.asarray(x)))
        assert_waveform_parity(got, want)


class TestTasNetDPRNNParity:
    def test_same_weights_same_output(self, ref_models, rng):
        import jax.numpy as jnp

        from audio_only_speech_separation_tpu.models import TasNet
        from audio_only_speech_separation_tpu.utils.torch_import import convert

        kw = dict(
            enc_dim=16, bn_dim=16, hidden_dim=16, win=16, layer=2, num_spk=2,
            module="DPRNN", group_size=1, block_size=20, sample_rate=8000,
            unfold=False,
        )
        from parity_utils import assert_waveform_parity, torch_forward_f64

        ref = ref_models.TasNet(**kw)
        x = rng.normal(size=(1, 2000)).astype(np.float32)
        params = convert("TasNet", to_numpy_sd(ref), layer=2)
        want = torch_forward_f64(ref, x)
        ours = TasNet(**kw)
        got = np.asarray(ours.apply(params, jnp.asarray(x)))
        assert_waveform_parity(got, want)
