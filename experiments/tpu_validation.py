"""On-hardware validation: Pallas kernels vs XLA references on the real TPU
chip, plus a behavior snapshot. CPU CI runs the same checks in interpret
mode (tests/test_pallas_kernels.py, tests/test_replan_query.py); this
script certifies the Mosaic-compiled versions."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.pathfinding import (
    dist_nextdir_at, dynamic_fields, passable_grid,
)
from swarm_ode_tpu.env.state import agent_class, make_params, occupancy_grids
from swarm_ode_tpu.ops.bfs_pallas import bfs_dist_pallas, bfs_query_pallas
from swarm_ode_tpu.ops.segment import segment_sum
from swarm_ode_tpu.ops.segment_pallas import segment_sum_pallas
from swarm_ode_tpu.policies import heuristic as H

assert jax.default_backend() != "cpu", "run on the TPU chip"
print("backend:", jax.default_backend(), jax.devices())

cfg = EnvConfig.from_env_id("tarware-medium-19agvs-9pickers-partialobs-v1",
                            bfs_backend="xla")
lay = build_layout(cfg)
params = make_params(cfg, lay)

ok = True
for seed in range(3):
    es = step_mod.reset(params, jax.random.PRNGKey(seed))
    agv_g, pick_g, _, _ = occupancy_grids(params, es)
    occ = (agv_g > 0) | (pick_g > 0)
    cls = agent_class(params)
    tgt_idx = jax.random.randint(jax.random.PRNGKey(100 + seed),
                                 (params.num_agents,), params.num_goals,
                                 params.num_actions - 1)
    tgt = params.action_cells[tgt_idx]
    self_yx = es.agent_xy[:, ::-1]
    dist, pas = dynamic_fields(params, occ, tgt, self_yx, cls)
    W = params.grid_w
    dist_p = bfs_dist_pallas(pas, tgt[:, 0] * W + tgt[:, 1],
                             params.dynamic_bfs_iters)
    m1 = np.array_equal(np.asarray(dist), np.asarray(dist_p))
    d_ref, nd_ref = dist_nextdir_at(params, dist, pas, self_yx)
    d_f, nd_f = bfs_query_pallas(pas, tgt[:, 0] * W + tgt[:, 1],
                                 self_yx[:, 0] * W + self_yx[:, 1],
                                 params.dynamic_bfs_iters)
    m2 = np.array_equal(np.asarray(d_ref), np.asarray(d_f))
    m3 = np.array_equal(np.asarray(nd_ref), np.asarray(nd_f))
    print(f"seed {seed}: bfs_dist={m1} fused_dist={m2} fused_nd={m3}")
    ok &= m1 and m2 and m3

rng = np.random.RandomState(0)
E, D, N = 700, 9, 37
data = jnp.asarray(rng.randn(E, D).astype(np.float32))
ids = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
valid = jnp.asarray(rng.rand(E) < 0.9)
ref = segment_sum(data, ids, N, valid)
out = segment_sum_pallas(data, ids, N, valid, block_e=256)
m4 = np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
print("segment_sum_pallas:", m4)
ok &= m4
print("ALL TPU KERNEL CHECKS PASS" if ok else "FAILURES PRESENT")
