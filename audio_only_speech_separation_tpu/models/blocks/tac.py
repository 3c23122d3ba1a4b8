"""Transform-average-concatenate (TAC) — the GroupComm primitive.

Reference: look2hear/models/utils/gc3_basics.py:28-60.  Per-group transform →
mean over groups → concat → output transform → global norm, residual.  All
three transforms are Dense layers over the channel axis: pure MXU matmuls
batched over B×T×G.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.activations import PReLU
from ...ops.norms import GlobalLayerNorm


class TAC(nn.Module):
    """Input [B, G, N, T] → same shape, groups exchanged via mean pooling."""

    input_size: int  # N (per-group channels)
    hidden_size: int  # H

    @nn.compact
    def __call__(self, x):
        B, G, N, T = x.shape
        xt = jnp.transpose(x, (0, 3, 1, 2))  # [B, T, G, N]
        h = PReLU(name="act_in")(nn.Dense(self.hidden_size, name="transform")(xt))
        mean = jnp.mean(h, axis=2)  # [B, T, H]
        mean = PReLU(name="act_mean")(nn.Dense(self.hidden_size, name="average")(mean))
        mean = jnp.broadcast_to(mean[:, :, None, :], h.shape)
        cat = jnp.concatenate([h, mean], axis=-1)  # [B, T, G, 2H]
        out = PReLU(name="act_out")(nn.Dense(self.input_size, name="concat")(cat))
        out = jnp.transpose(out, (0, 2, 3, 1))  # [B, G, N, T]
        # per-(B,G) global norm over (N, T): torch GroupNorm(1, N), eps=1e-5
        out = GlobalLayerNorm(channels=N, eps=1e-5, name="norm")(
            out.reshape(B * G, N, T)
        ).reshape(B, G, N, T)
        return x + out
