"""Stochastic-depth DropPath (reference: look2hear/models/tdanet.py:15-35).

Per-sample binary gating of a residual branch: with probability ``rate``
the whole branch is zeroed for that batch element, otherwise scaled by
1/keep_prob. Identity when ``train=False`` or rate == 0 — so eval parity
is untouched. Uses the flax ``dropout`` rng stream.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
