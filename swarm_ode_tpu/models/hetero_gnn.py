"""Heterogeneous GNN encoder and the ODE-free Q-network ablation.

Parity: the shared GNN front-end of HeteroGraphODENetwork /
HeteroGraphGRUNetwork / HeteroGNNNetwork (reference run_gnode.py:80-96,
gru.py:84-95, graph.py:74-143): per-type linear embeddings, then
`num_layers` HeteroConv blocks of six SAGEConv relations with mean
aggregation per destination type, ReLU between blocks.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from swarm_ode_tpu.graphs.hetero import HeteroGraph
from swarm_ode_tpu.ops.sage import DenseSAGEConv


class HeteroConvBlock(nn.Module):
    """One HeteroConv({six relations}, aggr='mean') layer
    (reference run_gnode.py:87-96)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h_agv, h_pick, h_loc, g: HeteroGraph):
        d = self.hidden_dim
        # relation convs (names match the reference edge types)
        to_loc_from_agv = DenseSAGEConv(d, name="agv_targets_loc")(
            h_agv, h_loc, g.agv2loc
        )
        to_agv_from_loc = DenseSAGEConv(d, name="loc_targeted_agv")(
            h_loc, h_agv, g.loc2agv
        )
        to_agv_from_agv = DenseSAGEConv(d, name="agv_comm_agv")(
            h_agv, h_agv, g.agv2agv
        )
        to_loc_from_pick = DenseSAGEConv(d, name="pick_manages_loc")(
            h_pick, h_loc, g.pick2loc
        )
        to_pick_from_agv = DenseSAGEConv(d, name="agv_coop_pick")(
            h_agv, h_pick, g.agv2pick
        )
        to_agv_from_pick = DenseSAGEConv(d, name="pick_helps_agv")(
            h_pick, h_agv, g.pick2agv
        )
        # aggr='mean' over relations per destination type (PyG HeteroConv).
        new_agv = (to_agv_from_loc + to_agv_from_agv + to_agv_from_pick) / 3.0
        new_pick = to_pick_from_agv
        new_loc = (to_loc_from_agv + to_loc_from_pick) / 2.0
        return new_agv, new_pick, new_loc


class HeteroGNNEncoder(nn.Module):
    """Type embeddings + stacked HeteroConv blocks with ReLU.

    `coord_scale` < 1 normalizes the raw grid-coordinate features (agv cols
    3:7, picker cols 0:4) before embedding — the reference feeds raw
    coordinates (values up to the grid size) into its Q networks, which
    makes initial Q values O(100) and destabilizes TD learning; scaling
    keeps the math otherwise identical.
    """

    hidden_dim: int = 64
    num_layers: int = 2
    coord_scale: float = 1.0

    @nn.compact
    def __call__(self, g: HeteroGraph) -> Tuple[jnp.ndarray, ...]:
        agv_x, picker_x = g.agv_x, g.picker_x
        if self.coord_scale != 1.0:
            s = jnp.asarray(
                [1.0, 1.0, 1.0] + [self.coord_scale] * 4, jnp.float32
            )
            agv_x = agv_x * s
            picker_x = picker_x * self.coord_scale
        h_agv = nn.Dense(self.hidden_dim, name="agv_embedding")(agv_x)
        h_pick = nn.Dense(self.hidden_dim, name="picker_embedding")(picker_x)
        h_loc = nn.Dense(self.hidden_dim, name="location_embedding")(g.loc_x)
        for i in range(self.num_layers):
            h_agv, h_pick, h_loc = HeteroConvBlock(
                self.hidden_dim, name=f"conv{i}"
            )(h_agv, h_pick, h_loc, g)
            h_agv, h_pick, h_loc = (
                nn.relu(h_agv),
                nn.relu(h_pick),
                nn.relu(h_loc),
            )
        return h_agv, h_pick, h_loc


class QHead(nn.Module):
    """hidden -> hidden//2 -> action_size (reference run_gnode.py:103-113)."""

    hidden_dim: int
    action_size: int

    @nn.compact
    def __call__(self, h):
        h = nn.relu(nn.Dense(self.hidden_dim // 2)(h))
        return nn.Dense(self.action_size)(h)


class HeteroGNNNetwork(nn.Module):
    """ODE-free ablation: encoder -> Q heads directly
    (reference graph.py:74-143, M6)."""

    action_size: int
    hidden_dim: int = 64
    num_layers: int = 2
    coord_scale: float = 1.0

    @nn.compact
    def __call__(self, g: HeteroGraph) -> Dict[str, jnp.ndarray]:
        h_agv, h_pick, h_loc = HeteroGNNEncoder(
            self.hidden_dim, self.num_layers, self.coord_scale, name="encoder"
        )(g)
        return {
            "agv_q_values": QHead(self.hidden_dim, self.action_size,
                                  name="agv_head")(h_agv),
            "picker_q_values": QHead(self.hidden_dim, self.action_size,
                                     name="picker_head")(h_pick),
            "agv_embeddings": h_agv,
            "picker_embeddings": h_pick,
            "location_embeddings": h_loc,
        }
