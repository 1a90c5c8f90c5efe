"""GRU-based models: the heterogeneous graph-GRU Q-network and the
sequence trajectory baselines.

Parity: HeteroGraphGRUNetwork (reference gru.py:66-180), GRU/LSTM
trajectory predictors and position-only variants
(reference train_baselines.py:128-335).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from swarm_ode_tpu.graphs.hetero import HeteroGraph
from swarm_ode_tpu.models.hetero_gnn import HeteroGNNEncoder, QHead


class HeteroGraphGRUNetwork(nn.Module):
    """Encoder -> per-type GRU cell (carried hidden state) -> Q heads
    (reference gru.py:66-180). seq_len == 1 per call; hidden is explicit.
    """

    action_size: int
    hidden_dim: int = 256
    num_layers: int = 2
    coord_scale: float = 1.0

    @nn.compact
    def __call__(
        self,
        g: HeteroGraph,
        agv_hidden: jnp.ndarray,  # (A, hidden)
        picker_hidden: jnp.ndarray,  # (P, hidden)
    ) -> Dict[str, jnp.ndarray]:
        h_agv, h_pick, h_loc = HeteroGNNEncoder(
            self.hidden_dim, self.num_layers, self.coord_scale, name="encoder"
        )(g)
        new_agv_hidden, agv_out = nn.GRUCell(self.hidden_dim, name="agv_gru")(
            agv_hidden, h_agv
        )
        new_pick_hidden, pick_out = nn.GRUCell(
            self.hidden_dim, name="picker_gru"
        )(picker_hidden, h_pick)
        return {
            "agv_q_values": QHead(self.hidden_dim, self.action_size,
                                  name="agv_head")(agv_out),
            "picker_q_values": QHead(self.hidden_dim, self.action_size,
                                     name="picker_head")(pick_out),
            "agv_embeddings": agv_out,
            "picker_embeddings": pick_out,
            "location_embeddings": h_loc,
            "agv_hidden": new_agv_hidden,
            "picker_hidden": new_pick_hidden,
        }

    def init_hidden(self, n_agvs: int, n_pickers: int):
        """(reference gru.py:176-180)."""
        return (
            jnp.zeros((n_agvs, self.hidden_dim)),
            jnp.zeros((n_pickers, self.hidden_dim)),
        )


class _SeqDecoder(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, h):
        h = nn.relu(nn.Dense(self.hidden_dim // 2)(h))
        return nn.Dense(2)(h)


class GRUTrajectoryPredictor(nn.Module):
    """obs sequence -> encoder -> stacked GRU -> last hidden -> position
    (reference train_baselines.py:128-183)."""

    obs_dim: int
    num_agents: int
    hidden_dim: int = 128
    num_layers: int = 2

    @nn.compact
    def __call__(self, observations: jnp.ndarray) -> jnp.ndarray:
        """observations: (B, T, N, obs_dim) -> positions (B, N, 2)."""
        B, T, N, D = observations.shape
        x = observations.transpose(0, 2, 1, 3).reshape(B * N, T, D)
        x = nn.Dense(self.hidden_dim, name="encoder")(x)
        for i in range(self.num_layers):
            x = nn.RNN(nn.GRUCell(self.hidden_dim), name=f"gru{i}")(x)
        last = x[:, -1, :]
        pos = _SeqDecoder(self.hidden_dim, name="decoder")(last)
        return pos.reshape(B, N, 2)


class LSTMTrajectoryPredictor(nn.Module):
    """(reference train_baselines.py:186-241)."""

    obs_dim: int
    num_agents: int
    hidden_dim: int = 128
    num_layers: int = 2

    @nn.compact
    def __call__(self, observations: jnp.ndarray) -> jnp.ndarray:
        B, T, N, D = observations.shape
        x = observations.transpose(0, 2, 1, 3).reshape(B * N, T, D)
        x = nn.Dense(self.hidden_dim, name="encoder")(x)
        for i in range(self.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim), name=f"lstm{i}")(x)
        last = x[:, -1, :]
        pos = _SeqDecoder(self.hidden_dim, name="decoder")(last)
        return pos.reshape(B, N, 2)


class PositionOnlyGRU(nn.Module):
    """(reference train_baselines.py:244-288)."""

    num_agents: int
    hidden_dim: int = 64
    num_layers: int = 2

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        """positions: (B, T, N, 2) -> (B, N, 2)."""
        B, T, N, _ = positions.shape
        x = positions.transpose(0, 2, 1, 3).reshape(B * N, T, 2)
        for i in range(self.num_layers):
            x = nn.RNN(nn.GRUCell(self.hidden_dim), name=f"gru{i}")(x)
        pos = _SeqDecoder(self.hidden_dim, name="decoder")(x[:, -1, :])
        return pos.reshape(B, N, 2)


class PositionOnlyLSTM(nn.Module):
    """(reference train_baselines.py:291-335)."""

    num_agents: int
    hidden_dim: int = 64
    num_layers: int = 2

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        B, T, N, _ = positions.shape
        x = positions.transpose(0, 2, 1, 3).reshape(B * N, T, 2)
        for i in range(self.num_layers):
            x = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim), name=f"lstm{i}")(x)
        pos = _SeqDecoder(self.hidden_dim, name="decoder")(x[:, -1, :])
        return pos.reshape(B, N, 2)
