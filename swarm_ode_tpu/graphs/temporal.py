"""Spatio-temporal trajectory graph (reference GraphConverter,
train_gde.py:108-271).

A rolling window of W observation frames becomes one homogeneous graph:
  * nodes: W * num_agents, frame-major (slot 0 oldest);
  * spatial edges inside each frame: agent pairs with Euclidean distance
    < threshold (train_gde.py:228-244), both directions;
  * temporal chain edges from each agent's node in frame k to frame k+1
    (train_gde.py:246-267);
  * is_current marks the newest valid frame's agent nodes — GDE training
    losses apply only there (train_gde.py:487-490).

Fixed shapes: the window always holds W slots; before warmup the invalid
slots are masked out (node_mask) instead of shrinking the graph, so the
builder vmaps/scans cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TemporalWindow:
    """Rolling observation history (the reference's deque, train_gde.py:114)."""

    obs: jnp.ndarray  # (W, N, D) float32, slot 0 oldest valid frame
    count: jnp.ndarray  # () int32 — number of valid frames (<= W)


@struct.dataclass
class TemporalGraph:
    x: jnp.ndarray  # (W*N, D) node features
    adj: jnp.ndarray  # (W*N, W*N) bool adjacency [src, dst]
    node_mask: jnp.ndarray  # (W*N,) bool — valid nodes
    is_current: jnp.ndarray  # (W*N,) bool — newest frame's agents


def init_window(window: int, num_agents: int, obs_dim: int) -> TemporalWindow:
    return TemporalWindow(
        obs=jnp.zeros((window, num_agents, obs_dim), jnp.float32),
        count=jnp.int32(0),
    )


def extract_positions(obs: jnp.ndarray, num_agvs: int) -> jnp.ndarray:
    """(N, 2) (y, x) per agent from zero-padded partial obs: AGVs at indices
    3,4; pickers at 0,1 (reference train_gde.py:186-208)."""
    N = obs.shape[0]
    idx = jnp.arange(N)
    y = jnp.where(idx < num_agvs, obs[:, 3], obs[:, 0])
    x = jnp.where(idx < num_agvs, obs[:, 4], obs[:, 1])
    return jnp.stack([y, x], axis=-1)


def push_frame(
    w: TemporalWindow, obs: jnp.ndarray
) -> TemporalWindow:
    """Append a frame; once full, shift out the oldest (deque maxlen=W)."""
    W = w.obs.shape[0]
    full = w.count >= W
    shifted = jnp.where(full, jnp.roll(w.obs, -1, axis=0), w.obs)
    slot = jnp.minimum(w.count, W - 1)
    new_obs = shifted.at[slot].set(obs.astype(jnp.float32))
    return TemporalWindow(obs=new_obs, count=jnp.minimum(w.count + 1, W))


@struct.dataclass
class BatchedTemporalGraph:
    """Structured (never-materialized) form of a batch of temporal graphs.

    The dense (W*N, W*N) adjacency of `TemporalGraph` is block-structured:
    per-frame spatial blocks on the diagonal plus an identity temporal chain
    between consecutive frames. Keeping the parts separate lets SAGE
    aggregation run as one (B*W, N, N) einsum plus a frame shift — ~N x
    fewer FLOPs and no scatter-built adjacency, which is what makes the
    batched GDE train step fast on TPU (see ops/sage.py
    temporal_mean_aggregate)."""

    x: jnp.ndarray  # (B, W, N, D) node features
    spatial: jnp.ndarray  # (B, W, N, N) bool within-frame adjacency [src, dst]
    frame_valid: jnp.ndarray  # (B, W) bool
    count: jnp.ndarray  # (B,) int32 valid frames


def build_temporal_batch(
    obs: jnp.ndarray,
    count: jnp.ndarray,
    num_agvs: int,
    distance_threshold: float = 5.0,
) -> BatchedTemporalGraph:
    """Batched equivalent of vmap(build_temporal_graph): same spatial edges
    and frame validity, structured instead of dense (train_gde.py:228-267
    semantics). obs: (B, W, N, D); count: (B,) int32."""
    B, W, N, D = obs.shape
    frame_valid = jnp.arange(W)[None, :] < count[:, None]  # (B, W)

    flat = obs.reshape(B * W, N, D)
    pos = jax.vmap(extract_positions, in_axes=(0, None))(flat, num_agvs)
    pos = pos.reshape(B, W, N, 2)
    d2 = jnp.sum((pos[:, :, :, None, :] - pos[:, :, None, :, :]) ** 2, -1)
    spatial = (d2 < distance_threshold**2) & ~jnp.eye(N, dtype=bool)
    spatial = spatial & frame_valid[:, :, None, None]
    return BatchedTemporalGraph(
        x=obs, spatial=spatial, frame_valid=frame_valid,
        count=count.astype(jnp.int32),
    )


def build_temporal_graph(
    w: TemporalWindow,
    num_agvs: int,
    distance_threshold: float = 5.0,
) -> TemporalGraph:
    """Window -> fixed-shape global graph (train_gde.py:116-184)."""
    W, N, D = w.obs.shape
    frame_valid = jnp.arange(W) < w.count  # (W,)

    pos = jnp.stack(
        [extract_positions(w.obs[k], num_agvs) for k in range(W)]
    )  # (W, N, 2)

    # Spatial edges per frame: euclidean distance < threshold, i != j
    # (train_gde.py:228-244).
    d2 = jnp.sum(
        (pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1
    )  # (W, N, N)
    spatial = (d2 < distance_threshold**2) & ~jnp.eye(N, dtype=bool)[None]
    spatial = spatial & frame_valid[:, None, None]

    adj = jnp.zeros((W * N, W * N), bool)
    for k in range(W):
        adj = adj.at[k * N : (k + 1) * N, k * N : (k + 1) * N].set(spatial[k])

    # Temporal chain: frame k agent i -> frame k+1 agent i, k+1 valid
    # (train_gde.py:246-267 — only consecutive frames are linked).
    eye = jnp.eye(N, dtype=bool)
    for k in range(W - 1):
        link = eye & frame_valid[k + 1]
        adj = adj.at[k * N : (k + 1) * N, (k + 1) * N : (k + 2) * N].set(link)

    node_mask = jnp.repeat(frame_valid, N)
    cur_slot = jnp.maximum(w.count - 1, 0)
    is_current = (jnp.arange(W * N) // N) == cur_slot
    is_current = is_current & (w.count > 0)

    return TemporalGraph(
        x=w.obs.reshape(W * N, D),
        adj=adj,
        node_mask=node_mask,
        is_current=is_current,
    )
