"""Chunked (streaming-style) separation of long recordings.

Separation models are trained on short segments; production recordings can
be minutes long.  This utility splits a long waveform into overlapping
windows, runs the model on the whole window batch in ONE forward (batch
sharded over the `dp` mesh axis when a mesh is given — long-input
parallelism the reference has no analog for), then stitches:

1. per-window speaker order is aligned to the previous window by
   correlating estimates over the overlap region (PIT models may permute
   speakers between independent forwards);
2. windows are blended with a linear crossfade over the overlap.

The reference evaluates only full utterances at batch 1 (audio_test.py:71).
"""

from __future__ import annotations

from itertools import permutations
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _best_perm_by_overlap(prev_tail: np.ndarray, cur_head: np.ndarray) -> tuple:
    """Align speaker order: maximize summed correlation over the overlap.

    prev_tail, cur_head: [n_src, T_overlap].
    """
    n = prev_tail.shape[0]
    best, best_p = -np.inf, tuple(range(n))
    for p in permutations(range(n)):
        score = 0.0
        for i, j in enumerate(p):
            a, b = prev_tail[i], cur_head[j]
            denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-8
            score += float(np.dot(a, b)) / denom
        if score > best:
            best, best_p = score, p
    return best_p


def chunked_separate(
    model,
    params,
    wav: np.ndarray,  # [T]
    window_seconds: float = 8.0,
    overlap_seconds: float = 1.0,
    sample_rate: Optional[int] = None,
    mesh=None,
) -> np.ndarray:
    """Separate an arbitrarily long mono waveform → [n_src, T]."""
    sr = sample_rate or getattr(model, "sample_rate", 16000)
    win = int(window_seconds * sr)
    hop = win - int(overlap_seconds * sr)
    ov = win - hop
    T = wav.shape[-1]
    if T <= win:
        out = model.apply(params, jnp.asarray(wav[None].astype(np.float32)))
        return np.asarray(out)[0]

    n_win = -(-(T - ov) // hop)
    padded = np.zeros(ov + (n_win - 1) * hop + win, np.float32)
    padded[: T] = wav
    starts = [k * hop for k in range(n_win)]
    batch = np.stack([padded[s : s + win] for s in starts], 0)

    x = jnp.asarray(batch)
    if mesh is not None:
        from ..parallel import shard_batch

        # pad the window batch to a multiple of the mesh size
        n_dev = int(np.prod(mesh.devices.shape))
        pad = (-len(starts)) % n_dev
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, win), x.dtype)], 0)
        x = shard_batch(x, mesh)
    est = np.asarray(jax.jit(model.apply)(params, x))[: len(starts)]  # [W, n, win]

    n_src = est.shape[1]
    n_w = len(starts)
    out = np.zeros((n_src, padded.shape[0]), np.float32)
    weight = np.zeros(padded.shape[0], np.float32)
    ramp = np.linspace(0.0, 1.0, ov, dtype=np.float32)

    def window_weight(k):
        """Complementary linear crossfades: overlaps always sum to 1."""
        w = np.ones(win, np.float32)
        if k > 0:
            w[:ov] = ramp
        if k < n_w - 1:
            w[-ov:] = ramp[::-1]
        return w

    cur = est[0]
    out[:, starts[0] : starts[0] + win] += cur * window_weight(0)
    weight[starts[0] : starts[0] + win] += window_weight(0)
    for k in range(1, n_w):
        s = starts[k]
        perm = _best_perm_by_overlap(cur[:, -ov:], est[k][:, :ov])
        cur = est[k][list(perm)]
        w = window_weight(k)
        out[:, s : s + win] += cur * w
        weight[s : s + win] += w
    out /= np.maximum(weight, 1e-8)
    return out[:, :T]
