"""GraphSAGE message passing over dense masked adjacency.

Equivalent to PyG SAGEConv with mean aggregation (the only configuration
the reference uses: train_gde.py:27-29, run_gnode.py:89-95):
    out[d] = W_l @ mean_{s : adj[s, d]} x_src[s] + W_r @ x_dst[d] + b
Dense masked matmul form keeps the FLOPs on the MXU; no gather/scatter.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def masked_mean_aggregate(
    x_src: jnp.ndarray, adj: jnp.ndarray, node_mask=None, precision=None
) -> jnp.ndarray:
    """mean over in-neighbors: (adj^T @ x_src) / deg, zero where deg == 0.

    x_src: (S, D); adj: (S, T) bool [src, dst]; returns (T, D).
    `precision=None` lets the backend pick (bf16 MXU passes on TPU — the
    right trade for training); pass jax.lax.Precision.HIGHEST for exact f32.
    """
    a = adj.astype(x_src.dtype)
    if node_mask is not None:
        a = a * node_mask.astype(x_src.dtype)[:, None]
    deg = a.sum(axis=0)  # (T,)
    agg = jnp.matmul(a.T, x_src, precision=precision)  # (T, D) — MXU matmul
    return agg / jnp.maximum(deg, 1.0)[:, None]


def temporal_mean_aggregate(
    x: jnp.ndarray,
    spatial: jnp.ndarray,
    frame_valid: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """In-neighbor mean over a batch of temporal graphs in structured form.

    Exactly `masked_mean_aggregate` on the dense (W*N, W*N) adjacency that
    `build_temporal_graph` would assemble (per-frame spatial blocks + the
    frame k -> k+1 identity chain), but computed without materializing it:
    the spatial part is one (B*W, N, N) batched matmul and the temporal part
    is a frame shift. x: (B, W, N, D); spatial: (B, W, N, N) [src, dst];
    frame_valid: (B, W). Returns (B, W, N, D).

    Source-validity masking is implied: spatial blocks already carry the
    frame_valid factor, and a temporal edge into frame k (requires
    frame_valid[k]) always has a valid source frame k-1 (validity is a
    prefix).
    """
    a = spatial.astype(x.dtype)
    deg_sp = a.sum(axis=2)  # (B, W, N) in-degree from spatial edges
    agg = jnp.einsum("bwij,bwid->bwjd", a, x, precision=precision)
    # Temporal chain: node (k, j) receives x[k-1, j] when frame k is valid.
    has_prev = frame_valid & (jnp.arange(x.shape[1]) > 0)[None, :]  # (B, W)
    prev = jnp.roll(x, 1, axis=1)
    agg = agg + jnp.where(has_prev[..., None, None], prev, 0.0)
    deg = deg_sp + has_prev[..., None].astype(x.dtype)
    return agg / jnp.maximum(deg, 1.0)[..., None]


class TemporalSAGE(nn.Module):
    """SAGEConv(mean) over a `BatchedTemporalGraph`'s structured adjacency.

    Parameter tree is identical to `HomoSAGE` (lin_l with bias on the
    aggregate, lin_r without on the root), so weights transfer between the
    per-graph and batched paths bit-for-bit.
    """

    features: int

    @nn.compact
    def __call__(self, x, spatial, frame_valid):
        agg = temporal_mean_aggregate(x, spatial, frame_valid)
        out = nn.Dense(self.features, use_bias=True, name="lin_l")(agg)
        out = out + nn.Dense(self.features, use_bias=False, name="lin_r")(x)
        return out


class DenseSAGEConv(nn.Module):
    """SAGEConv(mean) over a dense boolean adjacency.

    Matches torch_geometric.nn.SAGEConv(in, out) semantics: `lin_l` applied
    to aggregated neighbor features (with bias), `lin_r` to root features
    (no bias). Nodes with no in-neighbors get only the root term — identical
    to PyG, whose scatter-mean yields zeros for isolated nodes.
    """

    features: int

    @nn.compact
    def __call__(self, x_src, x_dst, adj, src_mask=None):
        agg = masked_mean_aggregate(x_src, adj, src_mask)
        out = nn.Dense(self.features, use_bias=True, name="lin_l")(agg)
        out = out + nn.Dense(self.features, use_bias=False, name="lin_r")(x_dst)
        return out


class HomoSAGE(nn.Module):
    """Homogeneous convenience wrapper: x_src == x_dst."""

    features: int

    @nn.compact
    def __call__(self, x, adj, node_mask=None):
        return DenseSAGEConv(self.features)(x, x, adj, node_mask)
