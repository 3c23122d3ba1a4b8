"""The NegSDR loss family, vectorized JAX.

Formulas match the reference exactly (look2hear/losses/matrix.py:13-163):
optional zero-mean, SI-SDR projection (or raw SNR), eps=1e-8 inside both the
energy ratio and the log.  Everything is elementwise + reductions over the
time axis — XLA fuses the whole pairwise matrix into a handful of kernels;
no host syncs anywhere.

All functions accept an optional ``mask`` [B, T] for variable-length batches
(a capability the reference lacks — it runs eval at batch 1 with dynamic
shapes; on TPU we pad + mask instead, SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

EPS = 1e-8


def _apply_mask(x, mask):
    if mask is None:
        return x
    return x * mask[..., None, :] if x.ndim > mask.ndim else x * mask


def _zero_mean(x, mask: Optional[jnp.ndarray], axis=-1):
    if mask is None:
        return x - jnp.mean(x, axis=axis, keepdims=True)
    m = mask[..., None, :] if x.ndim > mask.ndim else mask
    denom = jnp.maximum(jnp.sum(m, axis=axis, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=axis, keepdims=True) / denom
    return (x - mean) * m


class PairwiseNegSDR:
    """All-pairs −SDR matrix [B, n_src, n_src]; entry [b, est, tgt].

    Reference: look2hear/losses/matrix.py:13-57.
    """

    def __init__(self, sdr_type: str, zero_mean: bool = True, take_log: bool = True, EPS: float = EPS):
        assert sdr_type in ("snr", "sisdr", "sdsdr")
        self.sdr_type = sdr_type
        self.zero_mean = zero_mean
        self.take_log = take_log
        self.eps = EPS

    def __call__(self, ests, targets, mask: Optional[jnp.ndarray] = None):
        assert ests.shape == targets.shape and ests.ndim == 3, (
            f"Inputs must be [batch, n_src, time], got {targets.shape} and {ests.shape}"
        )
        if self.zero_mean:
            targets = _zero_mean(targets, mask)
            ests = _zero_mean(ests, mask)
        elif mask is not None:
            targets = _apply_mask(targets, mask)
            ests = _apply_mask(ests, mask)
        s_tgt = targets[:, None, :, :]  # [B, 1, n, T]
        s_est = ests[:, :, None, :]  # [B, n, 1, T]
        if self.sdr_type in ("sisdr", "sdsdr"):
            dot = jnp.sum(s_est * s_tgt, axis=3, keepdims=True)
            tgt_energy = jnp.sum(jnp.square(s_tgt), axis=3, keepdims=True) + self.eps
            proj = dot * s_tgt / tgt_energy  # [B, n, n, T]
        else:
            proj = jnp.broadcast_to(s_tgt, s_est.shape[:1] + (s_est.shape[1],) + s_tgt.shape[2:])
        if self.sdr_type in ("sdsdr", "snr"):
            e_noise = s_est - s_tgt
        else:
            e_noise = s_est - proj
        ratio = jnp.sum(jnp.square(proj), axis=3) / (
            jnp.sum(jnp.square(e_noise), axis=3) + self.eps
        )
        if self.take_log:
            ratio = 10.0 * jnp.log10(ratio + self.eps)
        return -ratio


class SingleSrcNegSDR:
    """−SDR per batch item on [B, T] pairs (reference matrix.py:60-106)."""

    def __init__(self, sdr_type: str, zero_mean: bool = True, take_log: bool = True, reduction: str = "none", EPS: float = EPS):
        assert sdr_type in ("snr", "sisdr", "sdsdr")
        assert reduction in ("none", "mean")
        self.sdr_type = sdr_type
        self.zero_mean = zero_mean
        self.take_log = take_log
        self.reduction = reduction
        self.eps = EPS

    def __call__(self, ests, targets, mask: Optional[jnp.ndarray] = None):
        assert ests.shape == targets.shape and ests.ndim == 2, (
            f"Inputs must be [batch, time], got {targets.shape} and {ests.shape}"
        )
        if self.zero_mean:
            targets = _zero_mean(targets, mask)
            ests = _zero_mean(ests, mask)
        elif mask is not None:
            targets = targets * mask
            ests = ests * mask
        if self.sdr_type in ("sisdr", "sdsdr"):
            dot = jnp.sum(ests * targets, axis=1, keepdims=True)
            tgt_energy = jnp.sum(jnp.square(targets), axis=1, keepdims=True) + self.eps
            scaled = dot * targets / tgt_energy
        else:
            scaled = targets
        if self.sdr_type in ("sdsdr", "snr"):
            e_noise = ests - targets
        else:
            e_noise = ests - scaled
        losses = jnp.sum(jnp.square(scaled), axis=1) / (
            jnp.sum(jnp.square(e_noise), axis=1) + self.eps
        )
        if self.take_log:
            losses = 10.0 * jnp.log10(losses + self.eps)
        if self.reduction == "mean":
            losses = jnp.mean(losses)
        return -losses


class MultiSrcNegSDR:
    """Fixed-order −SDR averaged over sources (reference matrix.py:109-151)."""

    def __init__(self, sdr_type: str, zero_mean: bool = True, take_log: bool = True, EPS: float = EPS):
        assert sdr_type in ("snr", "sisdr", "sdsdr")
        self.sdr_type = sdr_type
        self.zero_mean = zero_mean
        self.take_log = take_log
        self.eps = EPS

    def __call__(self, ests, targets, mask: Optional[jnp.ndarray] = None):
        assert ests.shape == targets.shape and ests.ndim == 3, (
            f"Inputs must be [batch, n_src, time], got {targets.shape} and {ests.shape}"
        )
        if self.zero_mean:
            targets = _zero_mean(targets, mask)
            ests = _zero_mean(ests, mask)
        elif mask is not None:
            targets = _apply_mask(targets, mask)
            ests = _apply_mask(ests, mask)
        if self.sdr_type in ("sisdr", "sdsdr"):
            dot = jnp.sum(ests * targets, axis=2, keepdims=True)
            tgt_energy = jnp.sum(jnp.square(targets), axis=2, keepdims=True) + self.eps
            scaled = dot * targets / tgt_energy
        else:
            scaled = targets
        if self.sdr_type in ("sdsdr", "snr"):
            e_noise = ests - targets
        else:
            e_noise = ests - scaled
        ratio = jnp.sum(jnp.square(scaled), axis=2) / (
            jnp.sum(jnp.square(e_noise), axis=2) + self.eps
        )
        if self.take_log:
            ratio = 10.0 * jnp.log10(ratio + self.eps)
        return -jnp.mean(ratio, axis=-1)


# Aliases (reference matrix.py:154-163)
pairwise_neg_sisdr = PairwiseNegSDR("sisdr")
pairwise_neg_sdsdr = PairwiseNegSDR("sdsdr")
pairwise_neg_snr = PairwiseNegSDR("snr")
singlesrc_neg_sisdr = SingleSrcNegSDR("sisdr")
singlesrc_neg_sdsdr = SingleSrcNegSDR("sdsdr")
singlesrc_neg_snr = SingleSrcNegSDR("snr")
multisrc_neg_sisdr = MultiSrcNegSDR("sisdr")
multisrc_neg_sdsdr = MultiSrcNegSDR("sdsdr")
multisrc_neg_snr = MultiSrcNegSDR("snr")
