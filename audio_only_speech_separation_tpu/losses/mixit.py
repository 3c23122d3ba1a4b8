"""Mixture-invariant training (MixIT), on-device.

Contract matches the reference (look2hear/losses/mixit.py:109-318): find the
source→mixture partition minimizing the loss; ``generalized=True`` allows
two mixtures with unequal source counts, ``generalized=False`` requires
equal-size k-way partitions.

TPU redesign: each partition is a static 0/1 assignment matrix
[n_mix, n_src]; summing sources under a partition is a matmul, and the
best-partition estimate is recovered with a batched one-hot gather — no
per-batch Python loop (the reference loops over the batch on the host at
mixit.py:308-316).
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _parts_equal(n_src: int, n_mix: int) -> List[List[Sequence[int]]]:
    """All partitions of range(n_src) into n_mix parts of equal size."""
    k = n_src // n_mix

    def rec(lst, parts_left):
        if parts_left == 0:
            yield []
            return
        for c in combinations(lst, k):
            rest = [x for x in lst if x not in c]
            for r in rec(rest, parts_left - 1):
                yield [list(c), *r]

    return list(rec(list(range(n_src)), n_mix))


def _parts_generalized(n_src: int) -> List[List[Sequence[int]]]:
    """All 2-way partitions of range(n_src) with both sides non-empty."""
    out = []
    lst = list(range(n_src))
    for k in range(n_src + 1):
        for c in combinations(lst, k):
            if c and len(c) != n_src:
                rest = [x for x in lst if x not in c]
                out.append([list(c), rest])
    return out


def _assignment_tensor(parts, n_mix: int, n_src: int) -> np.ndarray:
    """[n_parts, n_mix, n_src] 0/1 matrices: A[p] @ sources sums partition p."""
    A = np.zeros((len(parts), n_mix, n_src), dtype=np.float32)
    for p, partition in enumerate(parts):
        for m, idxs in enumerate(partition):
            A[p, m, list(idxs)] = 1.0
    return A


class MixITLossWrapper:
    def __init__(self, loss_func: Callable, generalized: bool = True):
        self.loss_func = loss_func
        self.generalized = generalized

    def __call__(self, est_targets, targets, return_est: bool = False, **kwargs):
        """est_targets [B, n_src, T], targets (mixtures) [B, n_mix, T]."""
        assert est_targets.shape[0] == targets.shape[0]
        assert est_targets.shape[2] == targets.shape[2]
        n_mix, n_src = targets.shape[1], est_targets.shape[1]
        if self.generalized:
            if n_mix != 2:
                raise ValueError("generalized MixIT works only with two mixtures")
            parts = _parts_generalized(n_src)
        else:
            if n_src % n_mix != 0:
                raise ValueError(
                    "mixtures are assumed to contain the same number of sources"
                )
            parts = _parts_equal(n_src, n_mix)
        A = jnp.asarray(_assignment_tensor(parts, n_mix, n_src))  # [P, m, s]
        losses = []
        for p in range(len(parts)):
            est_mixes = jnp.einsum(
                "ms,bst->bmt", A[p], est_targets, precision=jax.lax.Precision.HIGHEST
            )
            losses.append(self.loss_func(est_mixes, targets, **kwargs))
        loss_set = jnp.stack(losses, axis=1)  # [B, P]
        min_loss = jnp.min(loss_set, axis=1)
        mean_loss = jnp.mean(min_loss)
        if not return_est:
            return mean_loss
        best = jnp.argmin(loss_set, axis=1)  # [B]
        A_best = A[best]  # [B, m, s]
        reordered = jnp.einsum(
            "bms,bst->bmt", A_best, est_targets, precision=jax.lax.Precision.HIGHEST
        )
        return mean_loss, reordered
