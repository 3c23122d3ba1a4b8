"""Training-time dropout/DropPath (VERDICT r1 missing #3).

Contract: ``train=True`` + a dropout rng makes stochastic outputs for the
models whose reference applies dropout (TDANet tdanet.py:198-213,251-261,
Sepformer sepformer.py:507, BSRNN bsrnn.py:14-31, Sandglasset
sandglasset.py:52-72) — while eval (train=False) stays deterministic and
identical to the pre-dropout behavior (the reference-parity tests cover
eval parity with the torch models).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_only_speech_separation_tpu.models import (
    BSRNN,
    ConvTasNet,
    Sandglasset,
    Sepformer,
    TDANet,
)
from audio_only_speech_separation_tpu.ops.dropout import DropPath


pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


def _build(model, x):
    params = model.init(jax.random.PRNGKey(0), x)
    return params


def _train_out(model, params, x, seed):
    return np.asarray(
        model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(seed)})
    )


MODELS = {
    "tdanet": lambda: TDANet(
        out_channels=8, in_channels=8, num_blocks=2, upsampling_depth=4,
        enc_kernel_size=4, num_sources=2, sample_rate=8000,
    ),
    "sepformer": lambda: Sepformer(
        encoder_kernel_size=16, encoder_out_nchannels=16, masknet_chunksize=20,
        masknet_numlayers=1, intra_numlayers=1, inter_numlayers=1,
        intra_nhead=4, inter_nhead=4, intra_dffn=16, inter_dffn=16,
        sample_rate=8000,
    ),
    "bsrnn": lambda: BSRNN(
        win=256, stride=64, feature_dim=8, num_spks=2, num_layer=1,
        num_repeat=1, context=0, dropout=0.2, bi_comm=True, sample_rate=8000,
    ),
    "sandglasset": lambda: Sandglasset(
        n_feats=8, bn_chan=8, hid_size=8, chunk_size=16, n_repeats=2,
        n_head=4, kernel_size=4, sr=8000, sample_rate=8000, dropout=0.2,
    ),
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_dropout_active_in_train_mode(name, rng):
    model = MODELS[name]()
    x = jnp.asarray(rng.normal(size=(2, 1600)).astype(np.float32))
    params = _build(model, x)

    a = _train_out(model, params, x, seed=1)
    b = _train_out(model, params, x, seed=2)
    assert not np.allclose(a, b), f"{name}: dropout rng has no effect in train mode"

    # same rng → same output (stochasticity comes only from the rng)
    a2 = _train_out(model, params, x, seed=1)
    np.testing.assert_allclose(a, a2)

    # eval mode needs no rng and is deterministic
    e1 = np.asarray(model.apply(params, x))
    e2 = np.asarray(model.apply(params, x, train=False))
    np.testing.assert_allclose(e1, e2)
    assert not np.allclose(a, e1), f"{name}: train mode should differ from eval"


def test_dropout_zero_is_identity_bsrnn(rng):
    """dropout=0.0 → train mode equals eval mode (no silent config knob)."""
    model = BSRNN(
        win=256, stride=64, feature_dim=8, num_spks=2, num_layer=1,
        num_repeat=1, context=0, dropout=0.0, bi_comm=True, sample_rate=8000,
    )
    x = jnp.asarray(rng.normal(size=(1, 1600)).astype(np.float32))
    params = _build(model, x)
    train = _train_out(model, params, x, seed=1)
    ev = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(train, ev)


def test_models_without_dropout_accept_train_flag(rng):
    model = ConvTasNet(N=16, L=16, B=8, H=8, P=3, X=1, R=1, num_spks=2, sample_rate=8000)
    x = jnp.asarray(rng.normal(size=(1, 800)).astype(np.float32))
    params = _build(model, x)
    a = np.asarray(
        model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    )
    b = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(a, b)


class TestDropPath:
    def test_eval_identity(self, rng):
        m = DropPath(0.5)
        x = jnp.asarray(rng.normal(size=(8, 4, 16)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(m.apply(params, x)), np.asarray(x))

    def test_train_per_sample_gating(self, rng):
        m = DropPath(0.5)
        x = jnp.asarray(np.ones((512, 3, 4), np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(
            m.apply(params, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
        )
        # each sample is either fully zero or fully scaled by 1/keep
        per_sample = y.reshape(512, -1)
        zero = np.all(per_sample == 0.0, axis=1)
        scaled = np.all(np.isclose(per_sample, 2.0), axis=1)
        assert np.all(zero | scaled)
        # keep ratio ≈ 0.5 and unbiased expectation
        assert 0.35 < scaled.mean() < 0.65
