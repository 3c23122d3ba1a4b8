"""CPU parity: the traced (jnp) ConvTasNet weight packer must match the
offline numpy packer — the folds feed the fused separator kernel, so a
drift here is silent model corruption (ops/pallas/convtasnet_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
    pack_convtasnet_full_params,
    pack_convtasnet_full_params_jnp,
)

pytestmark = pytest.mark.slow  # full-width model init (~512-ch)


def test_fused_train_apply_gated_off_tpu():
    # off-TPU the custom-VJP fused forward must decline, so the trainer's
    # fused_forward flag is a harmless no-op on CPU hosts
    from audio_only_speech_separation_tpu.models.convtasnet import (
        fused_forward_eligible,
        make_fused_train_apply,
    )

    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3,
        sample_rate=16000,
    )
    if jax.default_backend() != "tpu":
        assert make_fused_train_apply(model) is None
    assert fused_forward_eligible(model, backend="tpu")
    assert not fused_forward_eligible(model, backend="cpu")
    small = ConvTasNet(
        N=64, L=16, B=32, H=64, P=3, X=2, R=1, num_spks=2, sample_rate=8000
    )
    assert not fused_forward_eligible(small, backend="tpu")
    # norm='cLN' non-causal uses cumulative LN in the blocks; the kernel
    # computes gLN — must decline (ADVICE r3)
    cln = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=8, R=3, num_spks=3,
        sample_rate=16000, norm="cLN",
    )
    assert not fused_forward_eligible(cln, backend="tpu")
    # H beyond the VMEM envelope must decline rather than fail at compile
    big = ConvTasNet(
        N=1024, L=16, B=128, H=1024, P=3, X=8, R=3, num_spks=3,
        sample_rate=16000,
    )
    assert not fused_forward_eligible(big, backend="tpu")


def test_jnp_pack_matches_np_pack():
    model = ConvTasNet(
        N=512, L=16, B=128, H=512, P=3, X=2, R=2, num_spks=3,
        sample_rate=16000,
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4000), jnp.float32)
    )
    ref = pack_convtasnet_full_params(params, 2, 2, 3)
    got = jax.jit(
        lambda p: pack_convtasnet_full_params_jnp(p, 2, 2, 3)[:-1]
    )(params)
    assert pack_convtasnet_full_params_jnp(params, 2, 2, 3)[-1] == ref[-1]
    names = ["we", "w1s", "wsgs", "vecs", "cs", "alphas", "wm", "bm", "wd"]
    for name, a, b in zip(names, ref[:-1], got):
        assert a.shape == b.shape, (name, a.shape, b.shape)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-4, err_msg=name,
        )
