"""Graph Neural ODE for trajectory prediction (reference train_gde.py:20-106).

`GraphODEFunc` (three SAGE layers) is a flax module; `GraphODE` is a thin
composite binding it to the odeint library — JAX control flow can't call
flax submodules inside `lax.scan`, so integration happens over the pure
`apply` closure (standard flax neural-ODE idiom).
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from swarm_ode_tpu.graphs.temporal import BatchedTemporalGraph, TemporalGraph
from swarm_ode_tpu.ops.odeint import odeint
from swarm_ode_tpu.ops.sage import HomoSAGE, temporal_mean_aggregate


class GraphODEFunc(nn.Module):
    """dx/dt = SAGE(node->hidden) -> ReLU -> SAGE -> ReLU -> SAGE(->node)
    (reference train_gde.py:20-45)."""

    node_dim: int
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, t, x, adj, node_mask=None):
        h = nn.relu(HomoSAGE(self.hidden_dim, name="conv1")(x, adj, node_mask))
        h = nn.relu(HomoSAGE(self.hidden_dim, name="conv2")(h, adj, node_mask))
        return HomoSAGE(self.node_dim, name="conv3")(h, adj, node_mask)


class _Decoder(nn.Module):
    @nn.compact
    def __call__(self, h):
        return nn.Dense(2, name="position_decoder")(h)


class GraphODE:
    """Composite model: odeint(GraphODEFunc) + linear position decoder
    (reference train_gde.py:47-106). Pure-functional: init/apply."""

    def __init__(
        self,
        node_dim: int,
        num_agvs: int = 0,
        num_pickers: int = 0,
        hidden_dim: int = 64,
        ode_solver: str = "euler",
        rtol: float = 1e-3,
        atol: float = 1e-4,
    ):
        self.node_dim = node_dim
        self.num_agvs = num_agvs
        self.num_pickers = num_pickers
        self.ode_solver = ode_solver
        self.rtol = rtol
        self.atol = atol
        self.func = GraphODEFunc(node_dim, hidden_dim)
        self.decoder = _Decoder()

    def init(self, key, graph: TemporalGraph, time_span) -> Dict:
        k1, k2 = jax.random.split(key)
        func_p = self.func.init(k1, 0.0, graph.x, graph.adj, graph.node_mask)
        dec_p = self.decoder.init(k2, graph.x)
        return {"func": func_p, "decoder": dec_p}

    def apply(
        self,
        params: Dict,
        graph: TemporalGraph,
        time_span: jnp.ndarray,
        method: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        f = lambda t, y: self.func.apply(
            params["func"], t, y, graph.adj, graph.node_mask
        )
        sol = odeint(
            f,
            graph.x,
            time_span,
            method=method or self.ode_solver,
            rtol=self.rtol,
            atol=self.atol,
        )  # (T, nodes, node_dim)
        traj = self.decoder.apply(params["decoder"], sol)  # (T, nodes, 2)
        return {"trajectories": traj, "node_features": sol}

    def apply_batched(
        self,
        params: Dict,
        graph: BatchedTemporalGraph,
        time_span: jnp.ndarray,
        method: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Whole-batch fast path: same math as vmap(apply) over the dense
        per-graph adjacency, but SAGE aggregation runs on the structured
        (spatial blocks + temporal shift) form — no (W*N)^2 adjacency is
        built, so the train step is one fused stack of large matmuls
        instead of B small scatter-assembled graphs. Parameters are shared
        with the per-graph path (tests/test_gde_batched.py asserts
        equality)."""
        P = params["func"]["params"]

        def sage(name, agg, h):
            p = P[name]["DenseSAGEConv_0"]
            out = agg @ p["lin_l"]["kernel"] + p["lin_l"]["bias"]
            return out + h @ p["lin_r"]["kernel"]

        def f(t, y):
            h = y
            for name, act in (("conv1", True), ("conv2", True),
                              ("conv3", False)):
                agg = temporal_mean_aggregate(
                    h, graph.spatial, graph.frame_valid
                )
                h = sage(name, agg, h)
                if act:
                    h = jax.nn.relu(h)
            return h

        sol = odeint(
            f,
            graph.x,
            time_span,
            method=method or self.ode_solver,
            rtol=self.rtol,
            atol=self.atol,
        )  # (T, B, W, N, node_dim)
        dp = params["decoder"]["params"]["position_decoder"]
        traj = sol @ dp["kernel"] + dp["bias"]  # (T, B, W, N, 2)
        return {"trajectories": traj, "node_features": sol}

    def predict_trajectory(self, params, graph, num_steps: int):
        t = jnp.arange(0, num_steps + 1, dtype=jnp.float32)
        return self.apply(params, graph, t)["trajectories"]
