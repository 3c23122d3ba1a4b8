"""Two-step warm-start logic tests (reference audio_train_twostep.py:38-49)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_train_twostep import update_parameter


import pytest

pytestmark = pytest.mark.slow  # integration/parity: excluded from `make test-fast`


class TestWarmStart:
    def test_copies_sm_prefixed_subtrees_only(self):
        import audio_only_speech_separation_tpu.models as M

        model = M.TDANet(
            out_channels=8, in_channels=8, num_blocks=1, upsampling_depth=4,
            enc_kernel_size=4, num_sources=2, sample_rate=8000,
        )
        x = jnp.zeros((1, 800))
        p_fresh = model.init(jax.random.PRNGKey(0), x)
        p_pre = model.init(jax.random.PRNGKey(1), x)
        merged = update_parameter(p_fresh, p_pre, prefix="sm")

        def leaf(tree, *path):
            node = tree["params"]
            for k in path:
                node = node[k]
            return np.asarray(node)

        # sm subtree comes from the pretrained tree
        np.testing.assert_array_equal(
            leaf(merged, "sm", "unet", "res_conv", "bias"),
            leaf(p_pre, "sm", "unet", "res_conv", "bias"),
        )
        # encoder stays fresh
        np.testing.assert_array_equal(
            leaf(merged, "encoder", "Conv_0", "kernel"),
            leaf(p_fresh, "encoder", "Conv_0", "kernel"),
        )
