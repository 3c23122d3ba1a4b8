"""Chunked long-recording separation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_only_speech_separation_tpu.models import ConvTasNet
from audio_only_speech_separation_tpu.parallel import make_mesh
from audio_only_speech_separation_tpu.utils.chunked_inference import (
    _best_perm_by_overlap,
    chunked_separate,
)


class TestPermAlignment:
    def test_detects_swap(self, rng):
        a = rng.normal(size=(2, 400)).astype(np.float32)
        swapped = a[[1, 0]] + 0.01 * rng.normal(size=(2, 400)).astype(np.float32)
        assert _best_perm_by_overlap(a, swapped) == (1, 0)
        same = a + 0.01 * rng.normal(size=(2, 400)).astype(np.float32)
        assert _best_perm_by_overlap(a, same) == (0, 1)


class TestChunkedSeparate:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = ConvTasNet(N=16, L=8, B=8, H=8, X=1, R=1, num_spks=2, sample_rate=8000)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)))
        return model, params

    @pytest.mark.slow
    def test_short_input_passthrough(self, model_and_params, rng):
        model, params = model_and_params
        wav = rng.normal(size=4000).astype(np.float32)
        out = chunked_separate(model, params, wav, window_seconds=1.0,
                               overlap_seconds=0.25, sample_rate=8000)
        assert out.shape == (2, 4000)

    @pytest.mark.slow
    def test_long_input_shape_and_consistency(self, model_and_params, rng):
        model, params = model_and_params
        wav = rng.normal(size=20000).astype(np.float32) * 0.1
        out = chunked_separate(model, params, wav, window_seconds=1.0,
                               overlap_seconds=0.25, sample_rate=8000)
        assert out.shape == (2, 20000)
        assert np.all(np.isfinite(out))
        # interior energy should be on the scale of a direct forward
        direct = np.asarray(model.apply(params, jnp.asarray(wav[None])))[0]
        corr = np.corrcoef(out[0, 4000:6000], direct[0, 4000:6000])[0, 1]
        # windows differ from full-context forward (gLN is global), but the
        # stitched output should still track the same structure
        assert abs(corr) > 0.2

    def test_with_mesh_sharding(self, model_and_params, rng):
        model, params = model_and_params
        wav = rng.normal(size=20000).astype(np.float32) * 0.1
        out = chunked_separate(model, params, wav, window_seconds=1.0,
                               overlap_seconds=0.25, sample_rate=8000,
                               mesh=make_mesh(4))
        assert out.shape == (2, 20000)
        assert np.all(np.isfinite(out))
