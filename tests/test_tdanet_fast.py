"""Parity of the TDANet analytic-moment fast forward vs model.apply.

The fast path (models/tdanet.py::fast_inference_forward) folds every
ConvNorm gLN into channel-affines derived from per-channel moments; this
pins it to the reference-parity flax forward in f32, where the two must
agree to float tolerance (the algebra is exact; only summation order
differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import audio_only_speech_separation_tpu.models as M
from audio_only_speech_separation_tpu.models.tdanet import (
    fast_forward_eligible,
    fast_inference_forward,
)


@pytest.mark.parametrize(
    "depth,n_blocks,T",
    # depth 2 exercises the fused[-1] negative-index quirk branch of the
    # top-down chain; depth 3 the smallest regular pyramid — every depth
    # fast_forward_eligible admits is pinned here
    [(2, 2, 4000), (3, 2, 4000), (4, 2, 8000), (5, 2, 8000), (5, 1, 6399)],
)
def test_fast_forward_matches_apply(depth, n_blocks, T):
    model = M.TDANet(
        out_channels=16,
        in_channels=32,
        num_blocks=n_blocks,
        upsampling_depth=depth,
        enc_kernel_size=4,
        num_sources=2,
        sample_rate=16000,
    )
    assert fast_forward_eligible(model)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(3, T)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)
    fast = fast_inference_forward(model, params, x)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_fast_forward_bf16_close_to_f32():
    """The benchmark runs the fast path in bf16, where the E[x²]−μ²
    cancellation is most dangerous (ADVICE r4): check the bf16 fast
    forward is finite and SI-SNR-close to the f32 apply reference."""
    model = M.TDANet(
        out_channels=16, in_channels=32, num_blocks=2, upsampling_depth=4,
        enc_kernel_size=4, num_sources=2, sample_rate=16000,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 6000)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    p16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    fast = np.asarray(
        fast_inference_forward(model, p16, x.astype(jnp.bfloat16))
    ).astype(np.float32)
    assert np.all(np.isfinite(fast))
    err = ref - fast
    snr = 10.0 * np.log10(
        (ref**2).sum() / np.maximum((err**2).sum(), 1e-20)
    )
    assert snr > 20.0, f"bf16 fast path degraded: {snr:.1f} dB vs f32 apply"


def test_fast_forward_one_d_and_fallback():
    model = M.TDANet(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=4,
        enc_kernel_size=4, num_sources=2, sample_rate=16000,
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(4000,)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), x)
    fast = fast_inference_forward(model, params, x)
    ref = model.apply(params, x)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    folded = M.TDANet(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=4,
        enc_kernel_size=4, num_sources=2, sample_rate=16000, unfold=False,
    )
    assert not fast_forward_eligible(folded)
    p2 = folded.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(fast_inference_forward(folded, p2, x)),
        np.asarray(folded.apply(p2, x)),
        rtol=0, atol=0,
    )
