"""One-hot takes: TPU-friendly replacements for tiny-table gathers.

XLA lowers `arr[idx]` to a gather HLO; on TPU, gathers over small tables
run at ~1.5 GiB/s (scalar path through VMEM) and dominated the env-step
profile (round 2). For an N-element table an (M, N) compare + masked
reduce is pure VPU work at vector bandwidth — orders of magnitude faster
for the N <= a-few-hundred tables the env uses (agents, rack cells).
"""
from __future__ import annotations

import jax.numpy as jnp


def take_ids(arr: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """`arr[ids]` for 1-D arr via one-hot masked reduce.

    arr: (N,) any dtype; ids: (M,) int in [0, N). Returns (M,) arr.dtype.
    """
    N = arr.shape[0]
    oh = ids[:, None] == jnp.arange(N, dtype=ids.dtype)[None, :]  # (M, N)
    if arr.dtype == jnp.bool_:
        return jnp.any(oh & arr[None, :], axis=1)
    return jnp.sum(jnp.where(oh, arr[None, :], 0), axis=1).astype(arr.dtype)


def grid_at(table: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """`table[y, x]` for a small (H, W) table at M query points, via a
    one-hot masked reduce over the flattened grid (gather-free)."""
    H, W = table.shape
    flat = table.reshape(H * W)
    pos = (y * W + x).astype(jnp.int32)
    oh = pos[:, None] == jnp.arange(H * W, dtype=jnp.int32)[None, :]
    if table.dtype == jnp.bool_:
        return jnp.any(oh & flat[None, :], axis=1)
    return jnp.sum(jnp.where(oh, flat[None, :], 0), axis=1).astype(table.dtype)


def take_many(ids: jnp.ndarray, *arrays: jnp.ndarray):
    """take_ids for several same-length tables sharing one one-hot mask."""
    N = arrays[0].shape[0]
    oh = ids[:, None] == jnp.arange(N, dtype=ids.dtype)[None, :]
    out = []
    for arr in arrays:
        if arr.dtype == jnp.bool_:
            out.append(jnp.any(oh & arr[None, :], axis=1))
        else:
            out.append(
                jnp.sum(jnp.where(oh, arr[None, :], 0), axis=1).astype(arr.dtype)
            )
    return tuple(out)
