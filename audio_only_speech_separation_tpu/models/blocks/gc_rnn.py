"""GroupComm RNN: TAC + ProjRNN + norm per layer (reference groupcomm.py:10-45)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.norms import GlobalLayerNorm
from ...ops.rnn import ProjRNN
from .tac import TAC


class GC_RNN(nn.Module):
    """Input [B, dim, T] → same shape; dim is split into num_group groups."""

    input_size: int
    hidden_size: int
    num_group: int = 2
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        B, dim, T = x.shape
        G = self.num_group
        n = self.input_size // G
        h = self.hidden_size // G
        out = x.reshape(B, G, n, T)
        for i in range(self.num_layers):
            out = TAC(n, self.hidden_size * 3 // G, name=f"tac_{i}")(out)
            seq = jnp.transpose(out, (0, 1, 3, 2)).reshape(B * G, T, n)
            rnn_out = ProjRNN(h, bidirectional=self.bidirectional, name=f"rnn_{i}")(seq)
            # torch GroupNorm(1, n) default eps
            normed = GlobalLayerNorm(channels=n, eps=1e-5, name=f"norm_{i}")(
                jnp.swapaxes(rnn_out, 1, 2)
            )  # [B*G, n, T]
            seq = seq + jnp.swapaxes(normed, 1, 2)
            out = jnp.transpose(seq.reshape(B, G, T, n), (0, 1, 3, 2))
        return out.reshape(B, dim, T)
