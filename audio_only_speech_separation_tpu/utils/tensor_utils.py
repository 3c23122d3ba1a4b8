"""Array helpers (reference: look2hear/utils/torch_utils.py:12-49)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_x_to_y(x: jnp.ndarray, y: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Right-pad (or crop) x along `axis` to match y's length."""
    if axis != -1:
        raise NotImplementedError
    inp_len = y.shape[axis]
    out_len = x.shape[axis]
    if out_len >= inp_len:
        return x[..., :inp_len]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, inp_len - out_len)]
    return jnp.pad(x, pad)


def shape_reconstructed(reconstructed: jnp.ndarray, size) -> jnp.ndarray:
    """Match a reconstructed wav's leading shape to the original input."""
    if len(size) == 1:
        return reconstructed.squeeze(0)
    return reconstructed


def tensors_to_device(tensors, device=None):
    """Recursively device_put arrays; mirrors utils/torch_utils.py:30-49."""
    if hasattr(tensors, "shape"):
        return jax.device_put(tensors, device)
    if isinstance(tensors, (list, tuple)):
        return type(tensors)(tensors_to_device(t, device) for t in tensors)
    if isinstance(tensors, dict):
        return {k: tensors_to_device(v, device) for k, v in tensors.items()}
    return tensors
