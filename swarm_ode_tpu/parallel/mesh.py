"""Device mesh and sharding helpers.

The reference has no distributed layer (SURVEY.md §2.7: single process,
one device). This module supplies the TPU-native one: a `jax.sharding.Mesh`
over all devices with a data-parallel axis (and an optional model axis),
replicated parameters, batch-sharded inputs, and XLA-inserted collectives
under jit (psum for gradients — no NCCL/MPI analogue needed).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("dp",), shape: Optional[Sequence[int]] = None
) -> Mesh:
    """Mesh over all available devices. Default: 1-D data-parallel."""
    devices = np.asarray(jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a pytree of (B, ...) arrays with B sharded over `axis`."""
    sh = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple: int):
    """Pad leading axis to a multiple (so B divides the dp axis); returns
    (padded_tree, valid_mask)."""
    import jax.numpy as jnp

    leaves = jax.tree.leaves(batch)
    B = leaves[0].shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return batch, jnp.ones(B, bool)
    padded = jax.tree.map(
        lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]),
        batch,
    )
    mask = jnp.concatenate([jnp.ones(B, bool), jnp.zeros(pad, bool)])
    return padded, mask
