"""Resampling op parity vs torch (used by TDANet/AFRCNN/Sandglasset)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audio_only_speech_separation_tpu.ops.resample import (
    adaptive_avg_pool1d,
    avg_pool1d,
    interpolate_linear_align_corners,
    interpolate_nearest,
)


class TestResampleParity:
    @pytest.mark.parametrize("t_in,t_out", [(100, 37), (64, 128), (125, 250), (63, 63)])
    def test_nearest_matches_torch(self, rng, t_in, t_out):
        x = rng.normal(size=(2, 4, t_in)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=t_out, mode="nearest"
        ).numpy()
        got = np.asarray(interpolate_nearest(jnp.asarray(x), t_out))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("t_in,t_out", [(100, 37), (15, 250), (8, 64)])
    def test_adaptive_pool_matches_torch(self, rng, t_in, t_out):
        x = rng.normal(size=(2, 4, t_in)).astype(np.float32)
        want = torch.nn.functional.adaptive_avg_pool1d(
            torch.from_numpy(x), t_out
        ).numpy()
        got = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), t_out))
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("t_in,t_out", [(15, 64), (64, 250), (1, 32)])
    def test_linear_align_corners_matches_torch(self, rng, t_in, t_out):
        x = rng.normal(size=(2, 4, t_in)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=t_out, mode="linear", align_corners=True
        ).numpy()
        got = np.asarray(interpolate_linear_align_corners(jnp.asarray(x), t_out))
        np.testing.assert_allclose(got, want, atol=5e-5)

    @pytest.mark.parametrize("kernel", [4, 16])
    def test_avg_pool_matches_torch(self, rng, kernel):
        x = rng.normal(size=(2, 4, 250)).astype(np.float32)
        want = torch.nn.AvgPool1d(kernel, stride=kernel)(torch.from_numpy(x)).numpy()
        got = np.asarray(avg_pool1d(jnp.asarray(x), kernel, kernel))
        np.testing.assert_allclose(got, want, atol=1e-6)
