"""Activation registry (reference: look2hear/layers/activations.py:11-65)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PReLU(nn.Module):
    """PReLU with a single shared slope, torch nn.PReLU() default (init .25)."""

    num_parameters: int = 1
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.init, jnp.float32),
            (self.num_parameters,),
        )
        if self.num_parameters == 1:
            a = a[0]
        return jnp.where(x >= 0, x, a * x)


_ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "sigmoid": jax.nn.sigmoid,
    "softmax": jax.nn.softmax,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
}


def get_activation(identifier):
    """String → activation callable; 'prelu' returns the PReLU module class."""
    if identifier is None:
        return None
    if callable(identifier):
        return identifier
    if isinstance(identifier, str):
        if identifier == "prelu":
            return PReLU
        if identifier in _ACTIVATIONS:
            return _ACTIVATIONS[identifier]
        raise ValueError(f"Could not interpret activation identifier: {identifier}")
    raise ValueError(f"Could not interpret activation identifier: {identifier}")
