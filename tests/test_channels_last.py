"""Channels-last conv/norm paths are parameter-interchangeable with the
lax-conv channels-first paths and numerically equivalent.

The TDANet/AFRCNN TPU mapping runs the whole model on [B, T, C] (see
models/afrcnn.py header); these tests pin the invariant that makes that
safe: identical param pytrees and matching outputs for every lowering case
(depthwise, single-channel input, dense, grouped).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_only_speech_separation_tpu.ops.conv import Conv1d, PointwiseConv
from audio_only_speech_separation_tpu.ops.norms import GlobalLayerNorm
from audio_only_speech_separation_tpu.ops.resample import (
    adaptive_avg_pool1d,
    interpolate_nearest,
)


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda a: a.shape, tree)


@pytest.mark.parametrize(
    "cin,cout,k,stride,dilation,groups",
    [
        (16, 16, 5, 1, 1, 16),  # depthwise
        (16, 16, 5, 2, 1, 16),  # depthwise strided
        (16, 16, 5, 1, 2, 16),  # depthwise dilated
        (1, 24, 8, 4, 1, 1),    # single-channel encoder filterbank
        (12, 20, 3, 1, 1, 1),   # dense
        (12, 20, 3, 2, 1, 4),   # grouped
    ],
)
def test_conv1d_channels_last_matches_lax(cin, cout, k, stride, dilation, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, cin, 57)).astype(np.float32))
    pad = ((k - 1) // 2) * dilation
    cf = Conv1d(cout, k, stride=stride, padding=pad, dilation=dilation, groups=groups)
    cl = Conv1d(
        cout, k, stride=stride, padding=pad, dilation=dilation, groups=groups,
        channels_last=True,
    )
    p = cf.init(jax.random.PRNGKey(1), x)
    p_cl = cl.init(jax.random.PRNGKey(1), jnp.swapaxes(x, 1, 2))
    assert _tree_shapes(p) == _tree_shapes(p_cl)

    y_cf = cf.apply(p, x)
    y_cl = cl.apply(p, jnp.swapaxes(x, 1, 2))  # same params, CL path
    np.testing.assert_allclose(
        np.asarray(y_cf), np.asarray(jnp.swapaxes(y_cl, 1, 2)), atol=2e-5, rtol=2e-5
    )


def test_pointwise_channels_last_matches():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 24, 40)).astype(np.float32))
    cf = PointwiseConv(16)
    cl = PointwiseConv(16, channels_last=True)
    p = cf.init(jax.random.PRNGKey(1), x)
    p_cl = cl.init(jax.random.PRNGKey(1), jnp.swapaxes(x, 1, 2))
    assert _tree_shapes(p) == _tree_shapes(p_cl)
    y_cf = cf.apply(p, x)
    y_cl = cl.apply(p, jnp.swapaxes(x, 1, 2))
    np.testing.assert_allclose(
        np.asarray(y_cf), np.asarray(jnp.swapaxes(y_cl, 1, 2)), atol=2e-5, rtol=2e-5
    )


def test_gln_channels_last_matches():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 24, 40)).astype(np.float32))
    cf = GlobalLayerNorm(24, eps=1e-8)
    cl = GlobalLayerNorm(24, eps=1e-8, channels_last=True)
    p = cf.init(jax.random.PRNGKey(1), x)
    y_cf = cf.apply(p, x)
    y_cl = cl.apply(p, jnp.swapaxes(x, 1, 2))
    np.testing.assert_allclose(
        np.asarray(y_cf), np.asarray(jnp.swapaxes(y_cl, 1, 2)), atol=1e-5, rtol=1e-5
    )


def test_interpolate_nearest_repeat_fast_path():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 25)).astype(np.float32))
    # integer ratio: repeat fast path must equal the gather formula
    idx = np.minimum(np.floor(np.arange(100) * (25 / 100)).astype(np.int32), 24)
    expected = np.asarray(x)[:, :, idx]
    np.testing.assert_array_equal(np.asarray(interpolate_nearest(x, 100)), expected)
    # axis variant
    xt = jnp.swapaxes(x, 1, 2)
    got = interpolate_nearest(xt, 100, axis=1)
    np.testing.assert_array_equal(np.asarray(jnp.swapaxes(got, 1, 2)), expected)


def test_adaptive_pool_reshape_fast_path():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 48)).astype(np.float32))
    # 48 → 12: exact ratio; torch windows are contiguous size-4 blocks
    expected = np.asarray(x).reshape(2, 8, 12, 4).mean(-1)
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool1d(x, 12)), expected, atol=1e-6
    )
    got = adaptive_avg_pool1d(jnp.swapaxes(x, 1, 2), 12, axis=1)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got, 1, 2)), expected, atol=1e-6
    )
    # non-integer ratio falls back to the pooling-matrix path
    y = adaptive_avg_pool1d(x, 7)
    assert y.shape == (2, 8, 7)


def test_convtasnet_channels_last_forward_and_grad_parity():
    """The channels-last ConvTasNet (round-5 training-layout experiment)
    shares the exact param tree with the channels-first model and must
    match its forward AND its parameter gradients (the training surface)."""
    from audio_only_speech_separation_tpu.models import ConvTasNet

    kw = dict(N=32, L=16, B=32, H=32, P=3, X=2, R=1, num_spks=2,
              sample_rate=8000)
    cf = ConvTasNet(**kw)
    cl = ConvTasNet(channels_last=True, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3210)).astype(np.float32))
    p = cf.init(jax.random.PRNGKey(0), x)
    p_cl = cl.init(jax.random.PRNGKey(0), x)
    assert _tree_shapes(p) == _tree_shapes(p_cl)

    ref = cf.apply(p, x)
    got = cl.apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    tgt = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def loss(model):
        def f(pp):
            return jnp.mean((model.apply(pp, x) - tgt) ** 2)
        return f

    g_ref = jax.grad(loss(cf))(p)
    g_cl = jax.grad(loss(cl))(p)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    cl_leaves = jax.tree_util.tree_leaves(g_cl)
    for a, b in zip(ref_leaves, cl_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6
        )


def test_convtasnet_delayed_train_forward_and_grad():
    """make_delayed_train_apply (round 5): the fused kernel's delayed-norm
    algebra as plain differentiable XLA ops.  Its activations are
    bf16-rounded (that's the training path it serves), so the contract is
    SI-SNR-level agreement with the flax forward run on bf16-rounded
    weights, plus gradient direction agreement per parameter."""
    from audio_only_speech_separation_tpu.models import ConvTasNet
    from audio_only_speech_separation_tpu.models.convtasnet import (
        make_delayed_train_apply,
    )

    kw = dict(N=64, L=16, B=128, H=64, P=3, X=3, R=2, num_spks=2,
              sample_rate=8000)
    model = ConvTasNet(**kw)
    fn = make_delayed_train_apply(model)
    assert fn is not None
    # causal / cLN / P≠3 configs are refused, not silently wrong
    assert make_delayed_train_apply(ConvTasNet(norm="cLN", causal=True)) is None
    assert make_delayed_train_apply(ConvTasNet(P=5)) is None

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3210)).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), x)
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p
    )
    # flax reference on bf16-ROUNDED f32 weights (the CPU backend cannot
    # run the flax bf16 path itself)
    p_r = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
        if a.dtype == jnp.float32 else a, p
    )
    ref = np.asarray(model.apply(p_r, x), np.float32)
    got = np.asarray(fn(pb, x.astype(jnp.bfloat16)), np.float32)
    assert got.shape == ref.shape

    def sisnr(a, b):
        a = a - a.mean(-1, keepdims=True)
        b = b - b.mean(-1, keepdims=True)
        proj = (a * b).sum(-1, keepdims=True) / (b * b).sum(-1, keepdims=True) * b
        return 10 * np.log10(
            (proj**2).sum(-1) / (((a - proj) ** 2).sum(-1) + 1e-12)
        )

    assert sisnr(got, ref).min() > 30.0, sisnr(got, ref).min()

    tgt = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def l_ref(pp):
        return jnp.mean((model.apply(pp, x) - tgt) ** 2)

    def l_new(pp):
        return jnp.mean((fn(pp, x.astype(jnp.bfloat16)).astype(jnp.float32) - tgt) ** 2)

    g_ref = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                               jax.grad(l_ref)(p_r))
    )
    g_new = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                               jax.grad(l_new)(pb))
    )
    for a, b in zip(g_ref, g_new):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert np.isfinite(b).all()
        if na < 1e-9:
            continue
        cos = float((a * b).sum() / (na * nb + 1e-12))
        assert cos > 0.97, cos
