"""Padded edge-list utilities and segment reductions (the sparse path).

The dense-adjacency path (ops/sage.py) is the default for this framework's
graph sizes. These utilities provide the PyG-style sparse representation
for interop and for large graphs: fixed-capacity edge lists with validity
masks (SURVEY.md §2.3 "fixed-capacity padded edge lists"), plus segment-sum
message passing. A fused Pallas segment-sum kernel lives in
ops/segment_pallas.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def adjacency_to_edges(
    adj: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense (S, T) bool adjacency -> padded edge list.

    Returns (src (E,), dst (E,), valid (E,)) with E == capacity. Edges
    beyond capacity are dropped — callers should size capacity as S*T or a
    documented cap and monitor `overflowed` via count.
    """
    S, T = adj.shape
    flat = adj.reshape(-1)
    idx = jnp.nonzero(flat, size=capacity, fill_value=S * T)[0]
    valid = idx < S * T
    idx = jnp.minimum(idx, S * T - 1)
    src = idx // T
    dst = idx % T
    return src.astype(jnp.int32), dst.astype(jnp.int32), valid


def edge_count(adj: jnp.ndarray) -> jnp.ndarray:
    return adj.sum()


def segment_sum(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    valid=None,
) -> jnp.ndarray:
    """Masked segment sum: rows of `data` summed into `segment_ids` buckets."""
    if valid is not None:
        data = data * valid.astype(data.dtype)[:, None]
        segment_ids = jnp.where(valid, segment_ids, num_segments)
    out = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int, valid=None
) -> jnp.ndarray:
    s = segment_sum(data, segment_ids, num_segments, valid)
    ones = jnp.ones((data.shape[0], 1), data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, valid)
    return s / jnp.maximum(cnt, 1.0)


def gather_scatter_mean(
    x_src: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    num_dst: int,
) -> jnp.ndarray:
    """Sparse equivalent of ops.sage.masked_mean_aggregate: gather source
    features along edges, scatter-mean into destinations."""
    msgs = x_src[src]
    return segment_mean(msgs, dst, num_dst, valid)
