"""Dual-path RNN core (reference: look2hear/models/utils/dprnn.py:6-88).

Per layer: optional TAC group-comm, intra-chunk BiLSTM over the chunk axis
(+gLN, residual), inter-chunk (Bi)LSTM over the chunk-index axis (+gLN,
residual).  ``unfold=True`` shares one row/col RNN across all layers with a
gated depthwise 1×1 ``concat_block`` (dprnn.py:26-34,82).

TPU mapping: the row pass batches B·G·S sequences of length K and the col
pass batches B·G·K sequences of length S — both run as ONE bidirectional
scan each (see ops.rnn) with big per-step matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.activations import PReLU
from ...ops.norms import GlobalLayerNorm
from ...ops.rnn import ProjRNN
from .tac import TAC


class DepthwiseGate(nn.Module):
    """Depthwise 1×1 conv + PReLU (the unfold concat_block).

    Works on any [B, C, *spatial] rank (dual-path uses [B, C, K, S]; the
    TDANet/AFRCNN recurrent re-injection uses [B, C, T]).
    """

    channels: int
    channels_last: bool = False  # True: x is [B, *spatial, C]

    @nn.compact
    def __call__(self, x):  # [B, C, *spatial] ([B, *spatial, C] if CL)
        w = self.param("weight", nn.initializers.ones, (self.channels,))
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        if self.channels_last:
            shape = (1,) * (x.ndim - 1) + (self.channels,)
        else:
            shape = (1, self.channels) + (1,) * (x.ndim - 2)
        y = x * w.reshape(shape).astype(x.dtype) + b.reshape(shape).astype(x.dtype)
        return PReLU(name="act")(y)


class DPRNNCore(nn.Module):
    """Input [B, N, K, S] → [B, num_spk, G, out/(G·spk), K, S]-folded output.

    Returns [B, num_spk, output_size//num_spk, K, S] flattened over groups,
    matching the reference's ``.transpose(1, 2)`` output layout
    (dprnn.py:84-88).
    """

    input_size: int
    hidden_size: int
    output_size: int
    num_group: int = 1
    num_layers: int = 1
    bidirectional: bool = True
    unfold: bool = False

    @nn.compact
    def __call__(self, x):
        B, N, K, S = x.shape
        G = self.num_group
        n = self.input_size // G
        h = self.hidden_size // G
        num_spk = self.output_size // self.input_size

        if self.unfold:
            shared_row = ProjRNN(h, bidirectional=True, name="row_rnn_shared")
            shared_col = ProjRNN(h, bidirectional=self.bidirectional, name="col_rnn_shared")
            shared_row_norm = GlobalLayerNorm(n, eps=1e-8, channels_last=True, name="row_norm_shared")
            shared_col_norm = GlobalLayerNorm(n, eps=1e-8, channels_last=True, name="col_norm_shared")
            gate = DepthwiseGate(n, channels_last=True, name="concat_block")

        # Channels-last execution: row passes run on [BG, S, K, n] (the
        # exact layout the K-sequence scan consumes), col passes on
        # [BG, K, S, n].  Norms/residual/gate are layout-agnostic, so each
        # layer moves data exactly ONCE (the K↔S swap between passes) — the
        # dual-path minimum — instead of 4 channel transposes per layer.
        # Same params/math as the channels-first form (parity-tested).
        cur = jnp.transpose(x.reshape(B * G, n, K, S), (0, 3, 2, 1))
        for i in range(self.num_layers):
            if G > 1:
                # TAC exchanges across groups on [B, G, n, K·S]
                tmp = jnp.transpose(cur, (0, 3, 2, 1)).reshape(B, G, n, K * S)
                tmp = TAC(n, self.hidden_size * 3 // G, name=f"tac_{i}")(tmp)
                cur = jnp.transpose(
                    tmp.reshape(B * G, n, K, S), (0, 3, 2, 1)
                )

            # intra-chunk (row): sequences over K, batched over B*G*S
            row_rnn = shared_row if self.unfold else ProjRNN(h, bidirectional=True, name=f"row_rnn_{i}")
            row_out = row_rnn(cur.reshape(B * G * S, K, n)).reshape(B * G, S, K, n)
            row_norm = shared_row_norm if self.unfold else GlobalLayerNorm(n, eps=1e-8, channels_last=True, name=f"row_norm_{i}")
            cur = cur + row_norm(row_out)
            cur = jnp.swapaxes(cur, 1, 2)  # → [BG, K, S, n] col layout

            # inter-chunk (col): sequences over S, batched over B*G*K
            col_rnn = shared_col if self.unfold else ProjRNN(h, bidirectional=self.bidirectional, name=f"col_rnn_{i}")
            col_out = col_rnn(cur.reshape(B * G * K, S, n)).reshape(B * G, K, S, n)
            col_norm = shared_col_norm if self.unfold else GlobalLayerNorm(n, eps=1e-8, channels_last=True, name=f"col_norm_{i}")
            merged = cur + col_norm(col_out)
            cur = gate(merged) if self.unfold else merged
            if i + 1 < self.num_layers:
                cur = jnp.swapaxes(cur, 1, 2)  # back to row layout

        # output 1×1 Conv2d over channels: n → output_size//G per group
        out_ch = self.output_size // G
        w = self.param("out_kernel", nn.initializers.lecun_normal(), (n, out_ch))
        b = self.param("out_bias", nn.initializers.zeros, (out_ch,))
        y = jnp.einsum("bksc,cd->bdks", cur, w) + b[None, :, None, None]
        y = y.reshape(B, G, num_spk, out_ch // num_spk, K, S)
        y = jnp.swapaxes(y, 1, 2)  # [B, spk, G, out_ch/spk, K, S]
        return y.reshape(B, num_spk, G * (out_ch // num_spk), K, S)
