"""Normalization layers on [B, C, T] feature maps.

Semantics match the reference norm family
(look2hear/models/utils/normalizations.py:29-146, aliases gLN/cLN/LN/bN at
:142-145), with one deliberate deviation: the reference initializes the gLN
beta (bias) to *ones* (normalizations.py:34); we initialize to zeros, the
standard choice.  When importing reference weights the values are loaded, so
numerical parity is unaffected.

All norms here are statistics-over-data layers (no running stats except
BatchNorm1d, which carries batch_stats like torch BatchNorm).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _moments(x, axes):
    # statistics in float32 even under bf16 compute (mixed-precision policy).
    # Single-pass form: one HBM traversal instead of two — the conv-pyramid
    # models run ~12 gLNs per block, so the second pass is real HBM time.
    # Cancellation robustness: the naive E[x²] − μ² loses all precision when
    # μ² ≫ var.  Shifted-data form (Chan et al.): var = E[(x−c)²] − (μ−c)²
    # for any constant c; choosing c = one sampled element of x makes the
    # cancellation ratio (μ−c)²/var ≈ O(1) irrespective of the data offset,
    # while both reductions still read x in ONE fused pass (c is a broadcast
    # slice, and ∂var/∂c = 0 analytically so gradients are unaffected).
    x32 = x.astype(jnp.float32)
    c = jax.lax.stop_gradient(
        x32[tuple(slice(0, 1) if i in axes else slice(None) for i in range(x.ndim))]
    )
    xc = x32 - c
    mean_c = jnp.mean(xc, axis=axes, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xc), axis=axes, keepdims=True) - jnp.square(mean_c), 0.0
    )
    return mean_c + c, var


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over (C, T) jointly, per sample; per-channel affine.

    Equivalent to torch ``nn.GroupNorm(1, C)`` and the reference ``GlobalLN``
    (normalizations.py:44-47).
    """

    channels: int
    eps: float = 1e-8
    channels_last: bool = False  # True: x is [B, *spatial, C]

    @nn.compact
    def __call__(self, x):  # x: [B, C, *spatial] ([B, *spatial, C] if CL)
        axes = tuple(range(1, x.ndim))
        mean, var = _moments(x, axes)
        y = ((x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        if self.channels_last:
            shape = (1,) * (x.ndim - 1) + (self.channels,)
        else:
            shape = (1, self.channels) + (1,) * (x.ndim - 2)
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return y * gamma.reshape(shape).astype(y.dtype) + beta.reshape(shape).astype(
            y.dtype
        )


class FrameLayerNorm(nn.Module):
    """Per-frame channel norm: normalize over C at each time step.

    Matches the reference ``ChannelLN`` (normalizations.py:50-54) and
    ``CumulativeLayerNorm``-as-LayerNorm alias ``LN`` (:80-94), which — despite
    its name — is a plain per-frame LayerNorm over channels.
    """

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):  # [B, C, T]
        mean, var = _moments(x, (1,))
        y = ((x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.eps)).astype(x.dtype)
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        shape = (1, self.channels) + (1,) * (x.ndim - 2)
        return y * gamma.reshape(shape) + beta.reshape(shape)


# The reference exposes per-frame channel norm under two names with slightly
# different parameterizations; functionally identical here.
ChannelLayerNorm = FrameLayerNorm


class CumulativeLayerNorm(nn.Module):
    """cLN: causal cumulative layer norm (reference ``CumulateLN``,
    normalizations.py:97-138).

    Statistics at frame t are computed over channels × frames[0..t] via
    cumulative sums — causal, O(T) with cumsum (maps to an XLA scan).
    """

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):  # [B, C, T]
        _, C, T = x.shape
        step_sum = jnp.sum(x, axis=1)  # [B, T]
        step_pow = jnp.sum(jnp.square(x), axis=1)  # [B, T]
        cum_sum = jnp.cumsum(step_sum, axis=1)
        cum_pow = jnp.cumsum(step_pow, axis=1)
        cnt = jnp.arange(C, C * (T + 1), C, dtype=x.dtype).reshape(1, T)
        cum_mean = cum_sum / cnt
        cum_var = (cum_pow - 2.0 * cum_mean * cum_sum) / cnt + jnp.square(cum_mean)
        cum_std = jnp.sqrt(cum_var + self.eps)
        y = (x - cum_mean[:, None, :]) / cum_std[:, None, :]
        gain = self.param("gain", nn.initializers.ones, (1, self.channels, 1))
        bias = self.param("bias", nn.initializers.zeros, (1, self.channels, 1))
        return y * gain + bias


class BatchNorm1d(nn.Module):
    """BatchNorm over the channel axis of [B, C, T] with running stats.

    Reference alias ``bN`` (normalizations.py:70-77,145).  Uses flax
    batch_stats collection; pass ``use_running_average=True`` at eval.
    """

    channels: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        # flax BatchNorm normalizes over all axes except `axis`
        bn = nn.BatchNorm(
            use_running_average=use_running_average,
            axis=1,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
        )
        return bn(x)


_NORMS = {
    "gLN": GlobalLayerNorm,
    "cLN": CumulativeLayerNorm,
    "LN": FrameLayerNorm,
    "bN": BatchNorm1d,
    "GlobalLN": GlobalLayerNorm,
    "ChannelLN": FrameLayerNorm,
    "CumulateLN": CumulativeLayerNorm,
}


def get_norm(identifier):
    """String → norm class (reference normalizations.py:148-172)."""
    if identifier is None:
        return None
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        if identifier in _NORMS:
            return _NORMS[identifier]
        raise ValueError(f"Could not interpret normalization identifier: {identifier}")
    raise ValueError(f"Could not interpret normalization identifier: {identifier}")
