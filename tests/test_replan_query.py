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


def test_batched_compaction_matches_full():
    """Vmapped walled query with need-row compaction: flagged rows equal the
    uncompacted results exactly; unflagged rows report (INF, -1); overflow
    counts rows beyond the budget."""
    import functools

    from swarm_ode_tpu.ops.bfs_pallas import INF, bfs_query_walled_batched

    rng = np.random.RandomState(3)
    B, A, H, W = 7, 6, 9, 8
    Ws = W + 1
    pas = rng.rand(B, A, H, W) > 0.25
    pas_w = jnp.asarray(
        np.pad(pas, [(0, 0), (0, 0), (0, 0), (0, 1)]).reshape(B, A, H * Ws)
    )
    ty = rng.randint(0, H, (B, A))
    tx = rng.randint(0, W, (B, A))
    py = rng.randint(0, H, (B, A))
    px = rng.randint(0, W, (B, A))
    tgt_w = jnp.asarray(ty * Ws + tx, jnp.int32)
    pos_w = jnp.asarray(py * Ws + px, jnp.int32)
    need = jnp.asarray(rng.rand(B, A) < 0.4)
    iters = 20

    q = functools.partial(
        bfs_query_walled_batched, H=H, W=W, iters=iters, rows_per_block=8,
        interpret=True,
    )
    d_full, nd_full, ovf_full = q(pas_w, tgt_w, pos_w, jnp.ones((B, A), bool),
                                  row_frac=1.0)
    assert int(jnp.sum(ovf_full)) == 0

    d_c, nd_c, ovf_c = q(pas_w, tgt_w, pos_w, need, row_frac=0.5)
    # Budget 0.5*42 -> 24 rows (block 8) >= 17 flagged: no overflow, every
    # flagged row exact.
    assert int(jnp.sum(ovf_c)) == 0
    np.testing.assert_array_equal(
        np.asarray(d_c)[np.asarray(need)], np.asarray(d_full)[np.asarray(need)]
    )
    np.testing.assert_array_equal(
        np.asarray(nd_c)[np.asarray(need)],
        np.asarray(nd_full)[np.asarray(need)],
    )

    # Tiny budget: overflow counted, covered rows still exact.
    d_t, nd_t, ovf_t = q(pas_w, tgt_w, pos_w, need, row_frac=0.2)
    n_flagged = int(np.asarray(need).sum())
    assert int(jnp.sum(ovf_t)) == max(0, n_flagged - 8)
    covered = np.asarray(d_t) < int(INF)
    flagged_covered = covered & np.asarray(need)
    np.testing.assert_array_equal(
        np.asarray(d_t)[flagged_covered], np.asarray(d_full)[flagged_covered]
    )


def test_occ_based_compaction_matches_pas_based():
    """The compaction-first occ query (builds passable masks only for
    chosen rows) is bit-identical to the mask-first walled query on real
    env scenarios, compacted and uncompacted."""
    import functools

    from swarm_ode_tpu.env.pathfinding import passable_walled
    from swarm_ode_tpu.ops.bfs_pallas import (
        bfs_query_occ_batched,
        bfs_query_walled_batched,
    )

    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=4, num_pickers=2,
                    observation_type="partial", bfs_backend="xla")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    H, W = params.grid_h, params.grid_w
    Ws = W + 1
    n = H * Ws
    cls = agent_class(params)
    A = params.num_agents

    occs, tgts, poss, pases = [], [], [], []
    rng = np.random.RandomState(0)
    for seed in range(5):
        es = step_mod.reset(params, jax.random.PRNGKey(seed))
        agv_g, pick_g, _, _ = occupancy_grids(params, es)
        occ = (agv_g > 0) | (pick_g > 0)
        tgt_idx = rng.randint(params.num_goals, params.num_actions - 1, A)
        tgt = params.action_cells[jnp.asarray(tgt_idx)]
        self_yx = es.agent_xy[:, ::-1]
        occs.append(jnp.pad(occ, ((0, 0), (0, 1))).reshape(n))
        tgts.append(tgt[:, 0] * Ws + tgt[:, 1])
        poss.append(self_yx[:, 0] * Ws + self_yx[:, 1])
        pases.append(passable_walled(params, occ, tgt, self_yx, cls))

    occ_w = jnp.stack(occs)
    tgt_w = jnp.stack(tgts).astype(jnp.int32)
    pos_w = jnp.stack(poss).astype(jnp.int32)
    pas_w = jnp.stack(pases)
    pick_w = jnp.pad(params.picker_passable, ((0, 0), (0, 1))).reshape(n)
    need = jnp.asarray(np.random.RandomState(1).rand(5, A) < 0.4)
    iters = int(params.dynamic_bfs_iters)

    for frac in (1.0, 0.5):
        d_o, nd_o, ov_o = bfs_query_occ_batched(
            occ_w, tgt_w, pos_w, cls, need, pick_w, H, W, iters,
            row_frac=frac, rows_per_block=8, interpret=True,
        )
        d_p, nd_p, ov_p = bfs_query_walled_batched(
            pas_w, tgt_w, pos_w, need, H, W, iters,
            row_frac=frac, rows_per_block=8, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(d_o), np.asarray(d_p))
        np.testing.assert_array_equal(np.asarray(nd_o), np.asarray(nd_p))
        np.testing.assert_array_equal(np.asarray(ov_o), np.asarray(ov_p))
