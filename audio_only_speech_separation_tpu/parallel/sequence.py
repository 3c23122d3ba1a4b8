"""Sequence (chunk-axis) parallelism — the ``sp`` mesh axis.

The reference has no distributed sequence parallelism (SURVEY.md §5); its
long-sequence machinery is *algorithmic* — dual-path 50 %-overlap chunking
turns [B, N, T] into [B, N, K, S] (gc3_basics.py:63-109, sepformer.py:788).
That chunk axis S is a natural mesh dimension: the intra-chunk pass is
embarrassingly parallel over S, and the inter-chunk pass needs S gathered.

Design (the scaling-book recipe, not hand-written collectives): models
annotate the chunked tensor with a named sharding constraint on S; under a
mesh that carries an ``sp`` axis, XLA's SPMD partitioner keeps the intra
pass sharded and inserts the all-gather/reduce-scatter pair around the
inter pass on its own.  Off-mesh (single device, or a dp-only mesh) the
annotation is a no-op, so model code is identical in all deployments.

Usage:
    mesh = make_mesh(8, ("dp", "sp"), shape=(4, 2))
    with jax.set_mesh(mesh):
        out = jax.jit(model.apply)(params, batch)   # batch sharded on dp

Models call ``shard_chunks(x)`` on their [.., K, S] chunk tensors
(models/tasnet.py, models/sepformer.py).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


# Probe the mesh-introspection API once at import: if a JAX upgrade removes
# it, fail loudly instead of silently turning every sp constraint into a
# no-op (sequence parallelism would quietly disable itself otherwise).
if not hasattr(jax.sharding, "get_abstract_mesh"):  # pragma: no cover
    raise ImportError(
        "jax.sharding.get_abstract_mesh is unavailable in this JAX version; "
        "parallel.sequence needs a replacement mesh-introspection API"
    )


def current_mesh_axes() -> tuple:
    """Axis names of the mesh active via ``jax.set_mesh`` (empty if none)."""
    return tuple(jax.sharding.get_abstract_mesh().axis_names)


def maybe_shard(x, spec: P):
    """with_sharding_constraint iff every named axis in ``spec`` exists in
    the currently active mesh; identity otherwise (keeps models mesh-
    agnostic — the same code runs single-chip, dp-only, and dp×sp)."""
    axes = current_mesh_axes()
    named = {a for part in spec for a in ((part,) if isinstance(part, str) else tuple(part or ()))}
    if not named or not named.issubset(set(axes)):
        return x
    return jax.lax.with_sharding_constraint(x, spec)


def shard_chunks(x, chunk_axis: int = -1, axis_name: str = "sp"):
    """Annotate the dual-path chunk-index axis for sequence parallelism.

    ``x`` is a chunked feature tensor whose ``chunk_axis`` holds the chunk
    index S (dual-path layout [B, N, K, S]).  No-op without an active mesh
    carrying ``axis_name``.
    """
    ax = chunk_axis % x.ndim
    parts = [None] * x.ndim
    parts[ax] = axis_name
    return maybe_shard(x, P(*parts))
