"""Heterogeneous Graph Neural ODE Q-network (reference run_gnode.py:67-167).

Encoder -> per-agent-type neural ODE evolution (time-independent MLP vector
field, euler over [0, T] by default; dopri5 available like the commented
reference option at run_gnode.py:134-135) -> per-type Q heads.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from swarm_ode_tpu.graphs.hetero import HeteroGraph
from swarm_ode_tpu.models.hetero_gnn import HeteroGNNEncoder, QHead
from swarm_ode_tpu.ops.odeint import odeint


class ODEFunction(nn.Module):
    """dx/dt = MLP(x): hidden -> ode_hidden -> ode_hidden -> hidden with
    Tanh (reference run_gnode.py:153-167; time-independent)."""

    hidden_dim: int
    ode_hidden_dim: int = 32

    @nn.compact
    def __call__(self, t, x):
        h = nn.tanh(nn.Dense(self.ode_hidden_dim)(x))
        h = nn.tanh(nn.Dense(self.ode_hidden_dim)(h))
        return nn.Dense(self.hidden_dim)(h)


class CommRound(nn.Module):
    """One inter-agent message round over ALL agents (AGVs + Pickers):
    single-head scaled-dot-product attention with a residual connection.

    The round-3 QMIX plateau analysis (RESULTS.md) names zone/queue
    discipline — who yields, who backs off a contested aisle — as what
    independently-factorized utilities cannot express; the claim auction
    fixes pairwise target conflicts at selection time but each agent's Q
    still scores targets blind to the team's intent. This round lets
    every agent read every other agent's post-ODE embedding before its
    Q head scores actions. No reference counterpart (beyond-reference,
    VERDICT r3 item 8)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, h_all: jnp.ndarray) -> jnp.ndarray:  # (A, h)
        q = nn.Dense(self.hidden_dim)(h_all)
        k = nn.Dense(self.hidden_dim)(h_all)
        v = nn.Dense(self.hidden_dim)(h_all)
        att = jax.nn.softmax(
            (q @ k.T) / jnp.sqrt(jnp.float32(self.hidden_dim)), axis=-1
        )
        return h_all + nn.Dense(self.hidden_dim)(att @ v)


class HeteroGraphODENetwork:
    """Composite model (init/apply): encoder + per-type ODE + Q heads
    (reference run_gnode.py:67-151). comm=True inserts one CommRound
    between the ODE evolution and the Q heads."""

    def __init__(
        self,
        node_dims: Dict[str, int],
        action_size: int,
        hidden_dim: int = 64,
        num_layers: int = 2,
        ode_hidden_dim: int = 32,
        solver: str = "euler",
        coord_scale: float = 1.0,
        comm: bool = False,
    ):
        self.node_dims = dict(node_dims)
        self.action_size = action_size
        self.hidden_dim = hidden_dim
        self.solver = solver
        self.comm = comm
        self.encoder = HeteroGNNEncoder(hidden_dim, num_layers, coord_scale)
        self.ode_func_agv = ODEFunction(hidden_dim, ode_hidden_dim)
        self.ode_func_picker = ODEFunction(hidden_dim, ode_hidden_dim)
        self.agv_head = QHead(hidden_dim, action_size)
        self.picker_head = QHead(hidden_dim, action_size)
        if comm:
            self.comm_round = CommRound(hidden_dim)

    def init(self, key, g: HeteroGraph) -> Dict:
        ks = jax.random.split(key, 6)
        h = jnp.zeros((1, self.hidden_dim))
        params = {
            "encoder": self.encoder.init(ks[0], g),
            "ode_agv": self.ode_func_agv.init(ks[1], 0.0, h),
            "ode_picker": self.ode_func_picker.init(ks[2], 0.0, h),
            "agv_head": self.agv_head.init(ks[3], h),
            "picker_head": self.picker_head.init(ks[4], h),
        }
        if self.comm:
            params["comm"] = self.comm_round.init(ks[5], jnp.zeros(
                (2, self.hidden_dim)
            ))
        return params

    def apply(
        self, params: Dict, g: HeteroGraph, integration_time: float = 1.0
    ) -> Dict[str, jnp.ndarray]:
        h_agv, h_pick, h_loc = self.encoder.apply(params["encoder"], g)
        t = jnp.array([0.0, integration_time], jnp.float32)
        f_agv = lambda ti, y: self.ode_func_agv.apply(params["ode_agv"], ti, y)
        f_pick = lambda ti, y: self.ode_func_picker.apply(
            params["ode_picker"], ti, y
        )
        # Location nodes have no dynamics (reference run_gnode.py:137-138).
        evolved_agv = odeint(f_agv, h_agv, t, method=self.solver)[-1]
        evolved_pick = odeint(f_pick, h_pick, t, method=self.solver)[-1]
        if self.comm:
            n_agv = evolved_agv.shape[0]
            h_all = self.comm_round.apply(
                params["comm"],
                jnp.concatenate([evolved_agv, evolved_pick], axis=0),
            )
            evolved_agv, evolved_pick = h_all[:n_agv], h_all[n_agv:]
        return {
            "agv_q_values": self.agv_head.apply(params["agv_head"], evolved_agv),
            "picker_q_values": self.picker_head.apply(
                params["picker_head"], evolved_pick
            ),
            "agv_embeddings": evolved_agv,
            "picker_embeddings": evolved_pick,
            "location_embeddings": h_loc,
        }
