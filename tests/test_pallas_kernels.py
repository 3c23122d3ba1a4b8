"""Pallas kernel correctness tests.

These require a real TPU backend (the repo's conftest pins the suite to the
virtual CPU mesh, where Mosaic kernels cannot run), so they self-skip off
TPU.  On TPU hardware run them explicitly:

    JAX_PLATFORMS=axon python scripts/validate_pallas.py        # or
    python -m pytest tests/test_pallas_kernels.py --no-header -p no:cacheprovider

The driver's bench path exercises the same kernel on every round.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pallas TPU kernels need TPU hardware",
)


def build_chain(rng, X=4, T=2048, B=2):
    import jax.numpy as jnp

    from audio_only_speech_separation_tpu.models.convtasnet import Conv1DBlock

    x = rng.normal(size=(B, 128, T)).astype(np.float32) * 0.5
    params = {"params": {}}
    key = jax.random.PRNGKey(0)
    w = jnp.asarray(x)
    for i in range(X):
        blk = Conv1DBlock(128, 512, 3, dilation=2**i)
        key, k = jax.random.split(key)
        p = blk.init(k, w)
        params["params"][f"tcn_0_{i}"] = p["params"]
        w = blk.apply(p, w)
    return x, params, np.asarray(w)


class TestFusedTCN:
    def test_matches_xla_at_bf16_tolerance(self, rng):
        import jax.numpy as jnp

        from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
            fused_tcn_separator,
            pack_convtasnet_tcn_params,
        )

        x, params, ref = build_chain(rng)
        w1s, wsgs, vecs, cs, alphas, dils = pack_convtasnet_tcn_params(params, 1, 4)
        y = fused_tcn_separator(
            jnp.asarray(np.swapaxes(x, 1, 2)).astype(jnp.bfloat16),
            w1s, wsgs, vecs, cs, alphas, dils,
        )
        got = np.swapaxes(np.asarray(y.astype(jnp.float32)), 1, 2)
        err = np.abs(got - ref)
        scale = np.abs(ref).max()
        assert err.max() / scale < 0.02, (err.max(), scale)

    def test_odd_length_masking(self, rng):
        import jax.numpy as jnp

        from audio_only_speech_separation_tpu.ops.pallas.convtasnet_block import (
            fused_tcn_separator,
            pack_convtasnet_tcn_params,
        )

        x, params, ref = build_chain(rng, T=1500, B=1)
        w1s, wsgs, vecs, cs, alphas, dils = pack_convtasnet_tcn_params(params, 1, 4)
        y = fused_tcn_separator(
            jnp.asarray(np.swapaxes(x, 1, 2)).astype(jnp.bfloat16),
            w1s, wsgs, vecs, cs, alphas, dils,
        )
        got = np.swapaxes(np.asarray(y.astype(jnp.float32)), 1, 2)
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02
