"""Op-level numerical parity vs torch (SURVEY.md §7 hard-part 3).

Each test loads identical weights into our op and the torch equivalent and
compares outputs at float tolerance.  This is what makes reference
checkpoint import trustworthy.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from audio_only_speech_separation_tpu.ops.attention import MultiheadAttention
from audio_only_speech_separation_tpu.ops.conv import Conv1d, ConvEncoder, ConvTranspose1d
from audio_only_speech_separation_tpu.ops.norms import (
    CumulativeLayerNorm,
    FrameLayerNorm,
    GlobalLayerNorm,
)
from audio_only_speech_separation_tpu.ops.rnn import BiLSTM, LSTM


def jnp_of(x):
    return jnp.asarray(np.asarray(x))


class TestLSTMParity:
    def test_unidirectional(self, rng):
        D, H, B, T = 12, 16, 3, 25
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        tl = torch.nn.LSTM(D, H, 1, batch_first=True)
        with torch.no_grad():
            want, _ = tl(torch.from_numpy(x))
        m = LSTM(H)
        params = {
            "params": {
                "w_ih": jnp_of(tl.weight_ih_l0.detach().numpy().T),
                "w_hh": jnp_of(tl.weight_hh_l0.detach().numpy().T),
                "bias": jnp_of(
                    (tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy()
                ),
            }
        }
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)

    def test_bidirectional(self, rng):
        D, H, B, T = 8, 10, 2, 15
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        tl = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
        with torch.no_grad():
            want, _ = tl(torch.from_numpy(x))
        m = BiLSTM(H)
        params = {
            "params": {
                "w_ih": jnp_of(
                    np.stack(
                        [
                            tl.weight_ih_l0.detach().numpy().T,
                            tl.weight_ih_l0_reverse.detach().numpy().T,
                        ]
                    )
                ),
                "w_hh": jnp_of(
                    np.stack(
                        [
                            tl.weight_hh_l0.detach().numpy().T,
                            tl.weight_hh_l0_reverse.detach().numpy().T,
                        ]
                    )
                ),
                "bias": jnp_of(
                    np.stack(
                        [
                            (tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy(),
                            (tl.bias_ih_l0_reverse + tl.bias_hh_l0_reverse).detach().numpy(),
                        ]
                    )
                ),
            }
        }
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


class TestConvParity:
    def test_encoder_conv(self, rng):
        # Conv1d(1, N, win, stride, bias=False) == framed matmul encoder
        N, win, stride = 6, 16, 8
        x = rng.normal(size=(2, 160)).astype(np.float32)
        tc = torch.nn.Conv1d(1, N, win, stride=stride, bias=False)
        with torch.no_grad():
            want = tc(torch.from_numpy(x).unsqueeze(1)).numpy()
        enc = ConvEncoder(N, win, stride)
        params = {"params": {"kernel": jnp_of(tc.weight.detach().numpy()[:, 0, :].T)}}
        got = enc.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_dilated_depthwise_conv(self, rng):
        C, k, d = 8, 3, 4
        x = rng.normal(size=(2, C, 50)).astype(np.float32)
        tc = torch.nn.Conv1d(C, C, k, dilation=d, padding=d, groups=C)
        with torch.no_grad():
            want = tc(torch.from_numpy(x)).numpy()
        m = Conv1d(C, kernel_size=k, dilation=d, padding=d, groups=C)
        # flax Conv kernel [k, in/groups, out]; torch [out, in/groups, k]
        kernel = np.transpose(tc.weight.detach().numpy(), (2, 1, 0))
        params = {
            "params": {
                "Conv_0": {
                    "kernel": jnp_of(kernel),
                    "bias": jnp_of(tc.bias.detach().numpy()),
                }
            }
        }
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_conv_transpose(self, rng):
        Cin, k, s = 6, 16, 8
        x = rng.normal(size=(2, Cin, 20)).astype(np.float32)
        tc = torch.nn.ConvTranspose1d(Cin, 1, k, stride=s, bias=False)
        with torch.no_grad():
            want = tc(torch.from_numpy(x)).numpy()[:, 0]
        m = ConvTranspose1d(1, kernel_size=k, stride=s, use_bias=False)
        # torch CT weight [in, out, k] imports verbatim
        params = {"params": {"kernel": jnp_of(tc.weight.detach().numpy())}}
        got = m.apply(params, jnp.asarray(x))[:, 0]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestNormParity:
    def test_group_norm_1_group(self, rng):
        C = 10
        x = rng.normal(2.0, 3.0, size=(3, C, 40)).astype(np.float32)
        tn = torch.nn.GroupNorm(1, C, eps=1e-8)
        with torch.no_grad():
            tn.weight.copy_(torch.rand(C))
            tn.bias.copy_(torch.rand(C))
            want = tn(torch.from_numpy(x)).numpy()
        m = GlobalLayerNorm(C, eps=1e-8)
        params = {
            "params": {
                "gamma": jnp_of(tn.weight.detach().numpy()),
                "beta": jnp_of(tn.bias.detach().numpy()),
            }
        }
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_layer_norm_per_frame(self, rng):
        C = 12
        x = rng.normal(size=(2, C, 30)).astype(np.float32)
        tn = torch.nn.LayerNorm(C)
        with torch.no_grad():
            want = (
                tn(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
            )
        m = FrameLayerNorm(C, eps=1e-5)
        params = {
            "params": {
                "gamma": jnp_of(tn.weight.detach().numpy()),
                "beta": jnp_of(tn.bias.detach().numpy()),
            }
        }
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestMHAParity:
    def test_self_attention(self, rng):
        E, h, B, T = 16, 4, 2, 12
        x = rng.normal(size=(B, T, E)).astype(np.float32)
        tm = torch.nn.MultiheadAttention(E, h, batch_first=True)
        with torch.no_grad():
            want, _ = tm(*[torch.from_numpy(x)] * 3)
        m = MultiheadAttention(E, h)
        params = {
            "params": {
                "in_proj_weight": jnp_of(tm.in_proj_weight.detach().numpy()),
                "in_proj_bias": jnp_of(tm.in_proj_bias.detach().numpy()),
                "out_proj": {
                    "kernel": jnp_of(tm.out_proj.weight.detach().numpy().T),
                    "bias": jnp_of(tm.out_proj.bias.detach().numpy()),
                },
            }
        }
        got = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)

    def test_batched_axis1_matches_transposed(self, rng):
        """4-D [B, T, K, E] self-attention (K batched, layout-preserving —
        the Sandglasset blocks-0/5 path) must equal transposing to
        [B·K, T, E] and running the 3-D path with the same params."""
        E, h, B, T, K = 16, 4, 2, 9, 5
        x = rng.normal(size=(B, T, K, E)).astype(np.float32)
        m = MultiheadAttention(E, h)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = m.apply(params, jnp.asarray(x))
        x3 = jnp.transpose(jnp.asarray(x), (0, 2, 1, 3)).reshape(B * K, T, E)
        want = m.apply(params, x3).reshape(B, K, T, E).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
