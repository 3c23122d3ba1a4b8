"""Reference parity for TasNet variant axes: unfold weight sharing,
GroupComm (group_size>1), and the TCN / SudoRM-RF separator modules."""

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


def check(ref_models, rng, module, group_size=1, unfold=False, layer=2, T=2000, atol=1e-3):
    import jax.numpy as jnp

    from audio_only_speech_separation_tpu.models import TasNet
    from audio_only_speech_separation_tpu.utils.torch_import import convert

    from parity_utils import assert_waveform_parity, torch_forward_f64

    kw = dict(
        enc_dim=16, bn_dim=16, hidden_dim=16, win=16, layer=layer, num_spk=2,
        module=module, group_size=group_size, context_size=8, block_size=20,
        sample_rate=8000, unfold=unfold,
    )
    ref = ref_models.TasNet(**kw)
    x = rng.normal(size=(1, T)).astype(np.float32)
    params = convert(
        "TasNetFull", sd_of(ref), module=module, layer=layer,
        group_size=group_size, unfold=unfold,
    )
    want = torch_forward_f64(ref, x)
    got = np.asarray(TasNet(**kw).apply(params, jnp.asarray(x)))
    assert_waveform_parity(got, want, atol=atol)


class TestUnfoldVariants:
    def test_dprnn_unfold(self, ref_models, rng):
        check(ref_models, rng, "DPRNN", unfold=True)

    def test_dptnet_unfold(self, ref_models, rng):
        check(ref_models, rng, "DPTNet", unfold=True)


class TestGroupComm:
    def test_gc_dprnn(self, ref_models, rng):
        check(ref_models, rng, "DPRNN", group_size=2)


class TestOtherSeparators:
    def test_tcn(self, ref_models, rng):
        check(ref_models, rng, "TCN")

    def test_gc_tcn(self, ref_models, rng):
        check(ref_models, rng, "GC_TCN", group_size=2)

    def test_sudormrf(self, ref_models, rng):
        check(ref_models, rng, "SudoRMRF", T=4000)

    def test_gc_sudormrf(self, ref_models, rng):
        check(ref_models, rng, "GC_SudoRMRF", group_size=2, T=4000)
