"""On-device ring replay buffer of pytrees.

Replaces the reference's Python deques of PyG graph objects
(SimpleReplayBuffer, run_gnode.py:1011-1039; deque memories at
run_gnode.py:559, graph.py:221). Transitions are fixed-shape pytrees living
in device memory; sampling is a gather — no host round-trips.

Transitions store the compact *node features* of the hetero graph, not its
adjacency: the adjacency is a deterministic function of the features
(graphs/hetero.py), so it is rebuilt on device at sample time. That cuts
memory ~5x versus storing edges.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    storage: Any  # pytree of (capacity, ...) arrays
    ptr: jnp.ndarray  # () int32 — next write slot
    size: jnp.ndarray  # () int32 — filled slots


def init(example_item, capacity: int) -> ReplayBuffer:
    storage = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example_item,
    )
    return ReplayBuffer(storage=storage, ptr=jnp.int32(0), size=jnp.int32(0))


def capacity(buf: ReplayBuffer) -> int:
    return jax.tree.leaves(buf.storage)[0].shape[0]


def add(buf: ReplayBuffer, item) -> ReplayBuffer:
    cap = capacity(buf)
    storage = jax.tree.map(
        lambda s, x: s.at[buf.ptr].set(x), buf.storage, item
    )
    return ReplayBuffer(
        storage=storage,
        ptr=(buf.ptr + 1) % cap,
        size=jnp.minimum(buf.size + 1, cap),
    )


def add_batch(buf: ReplayBuffer, items) -> ReplayBuffer:
    """Add B items (leading axis) with ring wraparound."""
    cap = capacity(buf)
    B = jax.tree.leaves(items)[0].shape[0]
    idx = (buf.ptr + jnp.arange(B)) % cap
    storage = jax.tree.map(
        lambda s, x: s.at[idx].set(x), buf.storage, items
    )
    return ReplayBuffer(
        storage=storage,
        ptr=(buf.ptr + B) % cap,
        size=jnp.minimum(buf.size + B, cap),
    )


def sample(buf: ReplayBuffer, key, batch_size: int):
    """Uniform sample with replacement over filled slots
    (reference random.sample, run_gnode.py:619)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return jax.tree.map(lambda s: s[idx], buf.storage)


def clear(buf: ReplayBuffer) -> ReplayBuffer:
    """Empty the buffer (reference clears memory every 200 episodes,
    gru.py:1258-1260)."""
    return ReplayBuffer(storage=buf.storage, ptr=jnp.int32(0), size=jnp.int32(0))
