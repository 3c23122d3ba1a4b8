"""Device mesh + sharding utilities — the explicit replacement for the
reference's Lightning-hidden DDP/NCCL machinery (SURVEY.md §5).

The reference's only parallelism is single-host data parallelism via
``DDPStrategy`` (audio_train.py:22,126), with gradient all-reduce hidden in
torch DDP and loss sync via ``self.all_gather`` (audio_litmodule.py:92).
Here the same semantics are explicit and testable:

- a 1-D ``Mesh`` over all devices with axis ``dp`` (ICI on a TPU slice,
  DCN across hosts — XLA picks the collective algorithm per topology);
- parameters replicated, batches sharded on ``dp``;
- gradients are reduced by XLA automatically because the jitted train step
  computes a global-batch mean loss: the backward pass inserts the
  ``psum`` over ``dp`` — no hand-written all-reduce, no NCCL.

A second mesh axis (``mp``) is exposed for intra-model sharding of the
large dual-path batches; unused by default.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp"):
    """Device-put a (possibly nested) numpy batch with batch-axis sharding.

    Multi-host: each process passes its LOCAL batch shard; the result is a
    global jax.Array over the full mesh (the DCN analog of what torch DDP
    got implicitly from per-rank DataLoaders, reference audio_train.py:126).
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh):
    """Replicate a parameter/optimizer pytree across the mesh.

    Multi-host: every process must hold identical values (same-seed init or
    a loaded checkpoint); the global replicated array is assembled from the
    process-local copies."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_mesh(axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """A mesh over this process's addressable devices only — used for eval
    under multi-host DP, where per-host loader shards differ in batch count
    and global collectives inside the loop would deadlock."""
    devices = jax.local_devices()
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def local_shard_info() -> tuple[int, int]:
    """(shard_id, num_shards) for per-host input sharding."""
    return jax.process_index(), jax.process_count()
