"""Sequence (chunk-axis) parallelism: dp×sp mesh correctness.

The dual-path chunk axis S is annotated with a named sharding constraint
(parallel/sequence.py; hooked in models/tasnet.py + models/sepformer.py).
These tests pin: no-op behavior off-mesh, numerical equality between the
sharded and unsharded forward/backward, and that the constraint actually
produces sp-sharded intermediates (via the compiled sharding of a probe).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio_only_speech_separation_tpu.losses import PITLossWrapper, pairwise_neg_snr
from audio_only_speech_separation_tpu.models import BSRNN, Sepformer, TasNet
from audio_only_speech_separation_tpu.parallel import (
    make_mesh,
    maybe_shard,
    replicate,
    shard_batch,
    shard_chunks,
)

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
    ),
    pytest.mark.slow,  # 8-device trainer integration: excluded from `make test-fast`
]


def _tasnet():
    return TasNet(
        enc_dim=16, bn_dim=16, hidden_dim=32, win=16, layer=2,
        num_spk=2, module="DPRNN", block_size=8, sample_rate=8000,
    )


def test_maybe_shard_noop_off_mesh():
    x = jnp.ones((2, 3, 4))
    y = maybe_shard(x, P(None, None, "sp"))
    assert y is x  # identity — no active mesh
    z = shard_chunks(x)
    assert z is x


def test_forward_equality_dp_sp_mesh():
    model = _tasnet()
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.normal(size=(4, 1600)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix)
    ref = np.asarray(jax.jit(model.apply)(params, mix))

    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):
        p = replicate(params, mesh)
        b = shard_batch(mix, mesh)
        out = np.asarray(jax.jit(model.apply)(p, b))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_train_step_equality_dp_sp_mesh():
    import optax

    model = _tasnet()
    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=False)
    rng = np.random.default_rng(1)
    mix = jnp.asarray(rng.normal(size=(4, 1600)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(4, 2, 1600)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix)

    def loss(p, m, s):
        return loss_fn(model.apply(p, m), s)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss))(params, mix, src)

    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):
        p = replicate(params, mesh)
        bm, bs = shard_batch((mix, src), mesh)
        l_sp, g_sp = jax.jit(jax.value_and_grad(loss))(p, bm, bs)
    assert abs(float(l_sp) - float(l_ref)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, rtol=3e-4)


def test_sepformer_forward_equality_sp():
    model = Sepformer(
        encoder_out_nchannels=16, masknet_chunksize=8, masknet_numlayers=1,
        intra_numlayers=1, inter_numlayers=1, intra_nhead=2, inter_nhead=2,
        intra_dffn=32, inter_dffn=32, masknet_numspks=2, sample_rate=8000,
    )
    rng = np.random.default_rng(2)
    mix = jnp.asarray(rng.normal(size=(4, 800)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix)
    ref = np.asarray(jax.jit(model.apply)(params, mix))
    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):
        p = replicate(params, mesh)
        b = shard_batch(mix, mesh)
        out = np.asarray(jax.jit(model.apply)(p, b))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def _bsrnn():
    # win 256 @ 8 kHz → 8 bands (compute_band_widths), divisible by sp=2
    return BSRNN(
        win=256, stride=64, feature_dim=8, num_spks=2, num_layer=1,
        num_repeat=2, sample_rate=8000,
    )


def test_bsrnn_forward_equality_sp():
    """BSRNN's band axis on sp: sharded forward ≡ single-device forward."""
    model = _bsrnn()
    rng = np.random.default_rng(3)
    mix = jnp.asarray(rng.normal(size=(4, 1600)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix)
    ref = np.asarray(jax.jit(model.apply)(params, mix))
    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):
        p = replicate(params, mesh)
        b = shard_batch(mix, mesh)
        out = np.asarray(jax.jit(model.apply)(p, b))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_bsrnn_train_step_equality_sp():
    model = _bsrnn()
    loss_fn = PITLossWrapper(pairwise_neg_snr, threshold_byloss=False)
    rng = np.random.default_rng(4)
    mix = jnp.asarray(rng.normal(size=(4, 1600)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(4, 2, 1600)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix)

    def loss(p, m, s):
        return loss_fn(model.apply(p, m), s)

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss))(params, mix, src)
    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):
        p = replicate(params, mesh)
        bm, bs = shard_batch((mix, src), mesh)
        l_sp, g_sp = jax.jit(jax.value_and_grad(loss))(p, bm, bs)
    assert abs(float(l_sp) - float(l_ref)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, rtol=3e-4)


def test_constraint_produces_sp_sharding():
    """The probe tensor's compiled sharding must actually carry sp."""
    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):

        @jax.jit
        def f(x):
            y = shard_chunks(x)  # [B, N, K, S] layout
            return y * 2.0

        x = jnp.ones((2, 4, 8, 4))
        out = f(x)
        spec = out.sharding.spec
    # output inherits the constraint: last axis on sp
    assert tuple(spec)[-1] == "sp", spec
