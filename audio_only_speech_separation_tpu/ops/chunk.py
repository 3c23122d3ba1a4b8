"""50%-overlap segmentation and overlap-add merge on [B, C, T] features.

Behavioral contract (reference: look2hear/models/utils/gc3_basics.py:63-109):

- ``pad_segment``: right-pad so (stride + T) is a multiple of block_size,
  then pad ``block_stride`` zeros on both ends.
- ``split_feature``: two half-shifted strided views interleaved →
  [B, C, block_size, n_chunks] (note: chunk axis LAST, block axis 2 —
  the reference transposes to that layout at gc3_basics.py:89).
- ``merge_feature``: inverse overlap-add, dropping the aux/rest padding.

Round-trip property: merge(split(x)) == 2 * x (every sample covered by
exactly two 50%-overlapped chunks).  Tests rely on this.

TPU notes: implemented as reshape/concat only — no gather/scatter — so XLA
lowers it to pure layout ops that fuse with neighbors.
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_segment(x: jnp.ndarray, block_size: int):
    """x: [B, C, T] → padded [B, C, T'], rest (static int)."""
    B, C, T = x.shape
    stride = block_size // 2
    rest = block_size - (stride + T % block_size) % block_size
    if rest > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rest)))
    x = jnp.pad(x, ((0, 0), (0, 0), (stride, stride)))
    return x, rest


def split_feature(x: jnp.ndarray, block_size: int):
    """x: [B, C, T] → chunks [B, C, block_size, n_chunks], rest.

    Matches the reference layout exactly: two interleaved half-shifted
    segmentations, chunk index on the last axis.
    """
    x, rest = pad_segment(x, block_size)
    B, C, T = x.shape
    stride = block_size // 2
    # [B, C, n, block] each; n = (T - stride) // block
    b1 = x[:, :, : T - stride].reshape(B, C, -1, block_size)
    b2 = x[:, :, stride:].reshape(B, C, -1, block_size)
    # interleave along chunk axis: [b1_0, b2_0, b1_1, b2_1, ...]
    blocks = jnp.concatenate([b1[:, :, :, None, :], b2[:, :, :, None, :]], axis=3)
    blocks = blocks.reshape(B, C, -1, block_size)
    return jnp.swapaxes(blocks, 2, 3), rest  # [B, C, block, n_chunks]


def merge_feature(x: jnp.ndarray, rest: int):
    """x: [B, C, block_size, n_chunks] → overlap-added [B, C, T]."""
    B, C, block_size, n = x.shape
    stride = block_size // 2
    x = jnp.swapaxes(x, 2, 3).reshape(B, C, -1, block_size * 2)  # [B,C,n/2,2K]
    part1 = x[:, :, :, :block_size].reshape(B, C, -1)[:, :, stride:]
    part2 = x[:, :, :, block_size:].reshape(B, C, -1)[:, :, :-stride]
    out = part1 + part2
    if rest > 0:
        out = out[:, :, :-rest]
    return out
