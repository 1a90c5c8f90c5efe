"""Pallas kernels vs XLA references (interpret mode on the CPU test mesh;
the same kernels run compiled on TPU — see ops/bfs_pallas.py notes)."""
import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params


def test_segment_sum_pallas_matches_xla():
    from swarm_ode_tpu.ops.segment import segment_sum
    from swarm_ode_tpu.ops.segment_pallas import segment_sum_pallas

    rng = np.random.RandomState(0)
    E, D, N = 300, 7, 23
    data = jnp.asarray(rng.randn(E, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    valid = jnp.asarray(rng.rand(E) < 0.8)
    ref = segment_sum(data, ids, N, valid)
    out = segment_sum_pallas(data, ids, N, valid, block_e=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_bfs_pallas_matches_xla_interpret():
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.pathfinding import dynamic_fields
    from swarm_ode_tpu.env.state import agent_class, occupancy_grids
    from swarm_ode_tpu.ops.bfs_pallas import bfs_dist_pallas

    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=3, num_pickers=2,
                    observation_type="partial", bfs_backend="xla")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    es = step_mod.reset(params, jax.random.PRNGKey(0))
    agv_g, pick_g, _, _ = occupancy_grids(params, es)
    occ = (agv_g > 0) | (pick_g > 0)
    cls = agent_class(params)
    tgt_idx = jax.random.randint(
        jax.random.PRNGKey(1), (params.num_agents,), params.num_goals,
        params.num_actions - 1,
    )
    tgt = params.action_cells[tgt_idx]
    dist_xla, pas = dynamic_fields(params, occ, tgt, es.agent_xy[:, ::-1], cls)
    tgt_flat = tgt[:, 0] * params.grid_w + tgt[:, 1]
    dist_pal = bfs_dist_pallas(pas, tgt_flat, params.dynamic_bfs_iters,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(dist_xla), np.asarray(dist_pal))
