"""Fused replan query (Pallas, interpret) vs the two-stage XLA path."""
import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.pathfinding import (
    dist_nextdir_at,
    dynamic_fields,
    passable_grid,
)
from swarm_ode_tpu.env.state import agent_class, make_params, occupancy_grids
from swarm_ode_tpu.ops.bfs_pallas import bfs_query_pallas


def test_fused_query_matches_two_stage():
    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=4, num_pickers=2,
                    observation_type="partial", bfs_backend="xla")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    for seed in range(4):
        es = step_mod.reset(params, jax.random.PRNGKey(seed))
        agv_g, pick_g, _, _ = occupancy_grids(params, es)
        occ = (agv_g > 0) | (pick_g > 0)
        cls = agent_class(params)
        tgt_idx = jax.random.randint(
            jax.random.PRNGKey(100 + seed), (params.num_agents,),
            params.num_goals, params.num_actions - 1,
        )
        tgt = params.action_cells[tgt_idx]
        self_yx = es.agent_xy[:, ::-1]

        dist, pas = dynamic_fields(params, occ, tgt, self_yx, cls)
        d_ref, nd_ref = dist_nextdir_at(params, dist, pas, self_yx)

        pas2, _ = passable_grid(params, occ, tgt, self_yx, cls)
        W = params.grid_w
        d_fused, nd_fused = bfs_query_pallas(
            pas2,
            tgt[:, 0] * W + tgt[:, 1],
            self_yx[:, 0] * W + self_yx[:, 1],
            params.dynamic_bfs_iters,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_fused))
        np.testing.assert_array_equal(np.asarray(nd_ref), np.asarray(nd_fused))
