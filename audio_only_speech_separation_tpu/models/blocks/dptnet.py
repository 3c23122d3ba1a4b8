"""Dual-path transformer core (reference: look2hear/models/utils/dptnet.py).

DPTNet's signature block replaces the transformer FFN with a BiLSTM(d→2d)
+ Linear(4d→d) recurrent feed-forward (dptnet.py:49-50,79).  Attention is
4-head self-attention; layer norms are post-norm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.attention import MultiheadAttention
from ...ops.rnn import BiLSTM, _DenseParams
from .dprnn import DepthwiseGate
from .tac import TAC


class TransformerEncoderLayerDPT(nn.Module):
    """MHA + post-norm + BiLSTM-FFN + post-norm, on [B, T, d]."""

    d_model: int
    nhead: int = 4

    @nn.compact
    def __call__(self, x):
        attn = MultiheadAttention(self.d_model, self.nhead, name="self_attn")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        # relu + Linear(4d→d) fused into the scan output (relu is element-
        # wise, so it distributes across the fwd/bwd projection split)
        pk, pb = _DenseParams(self.d_model, 4 * self.d_model, name="ffn_proj")()
        ffn = BiLSTM(self.d_model * 2, name="ffn_lstm")(x, pk, pb, nn.relu)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ffn)
        return x


class DPTNetCore(nn.Module):
    """Same dual-path loop as DPRNNCore with transformer rows/cols.

    Input [B, N, K, S] → [B, num_spk, output_size//num_spk, K, S].
    """

    input_size: int
    hidden_size: int
    output_size: int
    num_group: int = 1
    num_layers: int = 1
    unfold: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, K, S = x.shape
        G = self.num_group
        n = self.input_size // G
        num_spk = self.output_size // self.input_size

        if self.unfold:
            shared_row = TransformerEncoderLayerDPT(n, name="row_xfmr_shared")
            shared_col = TransformerEncoderLayerDPT(n, name="col_xfmr_shared")
            gate = DepthwiseGate(n, channels_last=True, name="concat_block")

        # channels-last dual-path execution (same layout discipline as
        # DPRNNCore): row passes on [BG, S, K, n], col passes on
        # [BG, K, S, n], exactly one K↔S swap between passes
        cur = jnp.transpose(x.reshape(B * G, n, K, S), (0, 3, 2, 1))
        for i in range(self.num_layers):
            if G > 1:
                tmp = jnp.transpose(cur, (0, 3, 2, 1)).reshape(B, G, n, K * S)
                tmp = TAC(n, self.hidden_size * 3 // G, name=f"tac_{i}")(tmp)
                cur = jnp.transpose(tmp.reshape(B * G, n, K, S), (0, 3, 2, 1))

            row_xfmr = shared_row if self.unfold else TransformerEncoderLayerDPT(n, name=f"row_xfmr_{i}")
            cur = cur + row_xfmr(cur.reshape(B * G * S, K, n)).reshape(B * G, S, K, n)
            cur = jnp.swapaxes(cur, 1, 2)  # → [BG, K, S, n]

            col_xfmr = shared_col if self.unfold else TransformerEncoderLayerDPT(n, name=f"col_xfmr_{i}")
            merged = cur + col_xfmr(cur.reshape(B * G * K, S, n)).reshape(B * G, K, S, n)
            cur = gate(merged) if self.unfold else merged
            if i + 1 < self.num_layers:
                cur = jnp.swapaxes(cur, 1, 2)  # back to row layout

        out_ch = self.output_size // G
        w = self.param("out_kernel", nn.initializers.lecun_normal(), (n, out_ch))
        b = self.param("out_bias", nn.initializers.zeros, (out_ch,))
        y = jnp.einsum("bksc,cd->bdks", cur, w) + b[None, :, None, None]
        y = y.reshape(B, G, num_spk, out_ch // num_spk, K, S)
        y = jnp.swapaxes(y, 1, 2)
        return y.reshape(B, num_spk, G * (out_ch // num_spk), K, S)
