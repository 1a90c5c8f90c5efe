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


def sample_recent(buf: ReplayBuffer, key, batch_size: int, window: int):
    """Uniform sample over the most recent `window` written slots — the
    on-policy window for actor-critic updates (COMA): stale transitions
    from older policies bias the policy gradient, so the actor should
    only see the data its own policy just generated. Newest items sit at
    ptr-1, ptr-2, ... (mod capacity)."""
    cap = capacity(buf)
    w = jnp.minimum(jnp.int32(window), buf.size)
    off = jax.random.randint(key, (batch_size,), 1, jnp.maximum(w, 1) + 1)
    idx = (buf.ptr - off) % cap
    return jax.tree.map(lambda s: s[idx], buf.storage)


def sample_nstep(
    buf: ReplayBuffer, key, batch_size: int, n: int, stride: int
):
    """Uniform sample with n-step chains.

    Requires items to carry scalar `_t` (global env-step counter), `_ep`
    (episode counter) and `done`. With `add_batch` writing `stride`
    lockstep envs per step, the transition k steps later for the same env
    sits `k*stride` slots ahead; a chain link is valid only while `_t`
    advances by exactly 1 per link (overwritten/unwritten slots fail this),
    the episode id matches (no bootstrapping across episode boundaries),
    and no earlier link was terminal.

    Returns the base-index sample plus:
      nstep_rewards (B, n, ...)  per-link rewards (invalid links zeroed),
      nstep_valid   (B, n)       link validity (k=0 always True),
      nstep_m       (B,)         chain length m in [1, n],
    and with next_feats / next_global_state / next_extras / done replaced
    by the chain-END values (bootstrap state s_{t+m}).
    """
    cap = capacity(buf)
    idx = jax.random.randint(
        key, (batch_size,), 0, jnp.maximum(buf.size, 1)
    )
    ks = jnp.arange(n, dtype=jnp.int32)
    chain = (idx[:, None] + ks[None, :] * stride) % cap  # (B, n)

    t = buf.storage["_t"][chain]
    ep = buf.storage["_ep"][chain]
    done = buf.storage["done"][chain]
    ok_link = (t == t[:, :1] + ks[None, :]) & (ep == ep[:, :1])
    done_before = (
        jnp.cumsum(
            jnp.pad(done[:, :-1], ((0, 0), (1, 0))).astype(jnp.int32), axis=1
        )
        > 0
    )
    valid = jnp.cumprod(
        (ok_link & ~done_before).astype(jnp.int32), axis=1
    ).astype(bool)  # (B, n); k=0 trivially valid
    m = valid.sum(axis=1)  # (B,) in [1, n]
    last = jnp.take_along_axis(chain, (m - 1)[:, None], axis=1)[:, 0]

    out = jax.tree.map(lambda s: s[idx], buf.storage)
    rew = buf.storage["rewards"][chain]
    out["nstep_rewards"] = jnp.where(
        valid.reshape(valid.shape + (1,) * (rew.ndim - 2)), rew, 0.0
    )
    out["nstep_valid"] = valid
    out["nstep_m"] = m
    for k in ("next_feats", "next_global_state", "next_extras"):
        if k in buf.storage:
            out[k] = jax.tree.map(lambda s: s[last], buf.storage[k])
    out["done"] = buf.storage["done"][last]
    return out


def clear(buf: ReplayBuffer) -> ReplayBuffer:
    """Empty the buffer (reference clears memory every 200 episodes,
    gru.py:1258-1260)."""
    return ReplayBuffer(storage=buf.storage, ptr=jnp.int32(0), size=jnp.int32(0))
