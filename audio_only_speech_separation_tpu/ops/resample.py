"""Static-shape resampling: nearest interpolation + adaptive average pooling.

torch-compatible semantics (F.interpolate(mode='nearest'),
F.adaptive_avg_pool1d) used by TDANet/AFRCNN multi-scale fusion
(reference tdanet.py:284-287,352; afrcnn.py:209,219).

Both are built from STATIC index maps / pooling matrices computed at trace
time, so XLA sees a gather (nearest) or a matmul (adaptive pool → MXU) with
fixed shapes.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _nearest_idx_map(in_size: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='nearest') source-index map, bit-exact.

    torch computes ``src = min(floorf(float32(dst) * float32(in/out)), in-1)``
    in FLOAT32 (aten nearest_neighbor_compute_source_index).  The f32 scale
    rounds differently from exact rational arithmetic at integer boundaries —
    e.g. 102→810 at dst=405: exact 405·102/810 = 51 but f64 floor gives 50
    while torch's f32 product floors to 51.  Reproducing the f32 arithmetic
    here (indices are static at trace time) keeps full-size AFRCNN/TDANet
    forward parity (caught by tests/test_config_scale_parity.py)."""
    scale = np.float32(in_size) / np.float32(out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1).astype(np.int32)


def interpolate_nearest(x: jnp.ndarray, size: int, axis: int = -1) -> jnp.ndarray:
    """torch 'nearest' along ``axis`` (f32 floor index map, see above).

    Integer upsampling ratios lower to a broadcast+reshape repeat instead of
    a gather — gathers on large TPU feature maps are far off roofline.  The
    repeat path is used only when the torch index map coincides with the
    pure-repeat pattern (verified per static shape at trace time).
    """
    T = x.shape[axis]
    if size == T:
        return x
    idx = _nearest_idx_map(T, size)
    if size % T == 0 and np.array_equal(idx, np.arange(size) // (size // T)):
        return jnp.repeat(x, size // T, axis=axis)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


@lru_cache(maxsize=64)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[in, out] averaging matrix with torch adaptive_avg_pool1d windows.

    Cached as NUMPY: caching a jnp array created under a trace would leak
    that trace's tracer into later jit invocations."""
    m = np.zeros((in_size, out_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[start:end, i] = 1.0 / (end - start)
    return m


def adaptive_avg_pool1d(
    x: jnp.ndarray, output_size: int, axis: int = -1
) -> jnp.ndarray:
    """torch adaptive_avg_pool1d along ``axis``.

    Exact integer downsampling ratios lower to a reshape+mean (one fused
    pass); the general case is a static pooling matmul.
    """
    T = x.shape[axis]
    if output_size == T:
        return x
    ax = axis % x.ndim
    if T % output_size == 0:
        r = T // output_size
        shape = x.shape[:ax] + (output_size, r) + x.shape[ax + 1 :]
        return x.reshape(shape).mean(axis=ax + 1)
    m = jnp.asarray(_adaptive_pool_matrix(T, output_size), x.dtype)
    moved = jnp.moveaxis(x, ax, -1)
    out = jnp.einsum("...t,to->...o", moved, m)
    return jnp.moveaxis(out, -1, ax)


def avg_pool1d(x: jnp.ndarray, kernel: int, stride: int | None = None) -> jnp.ndarray:
    """torch AvgPool1d(kernel, stride) with floor-truncated tail, on [..., T]."""
    stride = kernel if stride is None else stride
    T = x.shape[-1]
    n = (T - kernel) // stride + 1
    if stride == kernel:
        usable = n * kernel
        return x[..., :usable].reshape(*x.shape[:-1], n, kernel).mean(-1)
    m = np.zeros((T, n), dtype=np.float32)
    for i in range(n):
        m[i * stride : i * stride + kernel, i] = 1.0 / kernel
    # matrix in x.dtype: an f32 matrix would silently promote the whole
    # downstream graph to f32 under bf16 inference
    return jnp.einsum("...t,to->...o", x, jnp.asarray(m, x.dtype))


@lru_cache(maxsize=64)
def _linear_interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[in, out] matrix for torch Upsample(mode='linear', align_corners=True).
    Cached as numpy (see _adaptive_pool_matrix)."""
    m = np.zeros((in_size, out_size), dtype=np.float32)
    if in_size == 1:
        m[0, :] = 1.0
    else:
        for j in range(out_size):
            src = j * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
            lo = int(np.floor(src))
            hi = min(lo + 1, in_size - 1)
            frac = src - lo
            m[lo, j] += 1.0 - frac
            m[hi, j] += frac
    return m


def interpolate_linear_align_corners(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """x: [..., T] → [..., size], torch linear/align_corners=True semantics."""
    T = x.shape[-1]
    if size == T:
        return x
    # matrix in x.dtype — an f32 matrix promotes the product to f32, which
    # poisoned every Sandglasset block after the first (4× slower scans)
    return jnp.einsum(
        "...t,to->...o", x, jnp.asarray(_linear_interp_matrix(T, size), x.dtype)
    )
