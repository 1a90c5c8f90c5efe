"""Bit-packed wavefront BFS (ops/bfs_bitpack.py) vs the int32 min-plus
kernel — exact (d, nd) parity including tie-breaks, on random grids and
real env passable masks."""
import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.ops.bfs_bitpack import bitpack_query_call
from swarm_ode_tpu.ops.bfs_pallas import _pallas_query_call, _round_up


def _ref_query(pas_flat, tgt, pos, H, W, iters):
    """int32 kernel on (K, n) walled-flat inputs (interpret mode)."""
    K, n = pas_flat.shape
    Ws = W + 1
    HWp = _round_up(n + Ws, 128)
    rb = 8
    Kp = _round_up(K, rb)
    pasP = jnp.pad(pas_flat.astype(jnp.int32), ((0, Kp - K), (0, HWp - n)))
    t = jnp.pad(tgt.astype(jnp.int32), (0, Kp - K)).reshape(Kp, 1)
    p = jnp.pad(pos.astype(jnp.int32), (0, Kp - K)).reshape(Kp, 1)
    d, nd = _pallas_query_call(pasP, t, p, Ws, iters, rb, True)
    return d[:K], nd[:K]


def test_bitpack_rejects_wide_walled_rows():
    """Ws = W+1 >= 32 breaks the one-word carry assumption; the plan
    must fail loudly instead of silently mis-pathfinding (ADVICE r2)."""
    import pytest

    from swarm_ode_tpu.ops.bfs_bitpack import _plan

    with pytest.raises(ValueError, match="W\\+1 < 32"):
        _plan(3, 31)  # Ws = 32
    with pytest.raises(ValueError, match="W\\+1 < 32"):
        _plan(3, 33)  # Ws = 34
    _plan(3, 30)  # Ws = 31: fine


def test_bitpack_matches_int32_random():
    H, W = 9, 8
    Ws = W + 1
    n = H * Ws
    rng = np.random.RandomState(0)
    K = 40
    pas2d = rng.rand(K, H, W) > 0.25
    pas = jnp.asarray(
        np.pad(pas2d, [(0, 0), (0, 0), (0, 1)]).reshape(K, n)
    )
    ty, tx = rng.randint(0, H, K), rng.randint(0, W, K)
    py, px = rng.randint(0, H, K), rng.randint(0, W, K)
    tgt = jnp.asarray(ty * Ws + tx, jnp.int32)
    pos = jnp.asarray(py * Ws + px, jnp.int32)
    # Force target/pos cells free like the env does.
    col = np.arange(n)[None, :]
    pasf = jnp.asarray(
        np.asarray(pas)
        | (col == np.asarray(tgt)[:, None])
        | (col == np.asarray(pos)[:, None])
    )
    iters = 20
    d_ref, nd_ref = _ref_query(pasf, tgt, pos, H, W, iters)
    d_bp, nd_bp = bitpack_query_call(pasf, tgt, pos, H, W, iters,
                                     rows_per_block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_bp))
    np.testing.assert_array_equal(np.asarray(nd_ref), np.asarray(nd_bp))


def test_bitpack_matches_int32_env_masks():
    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.pathfinding import passable_walled
    from swarm_ode_tpu.env.state import (
        agent_class,
        make_params,
        occupancy_grids,
    )

    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=4,
                    num_pickers=2, observation_type="partial",
                    bfs_backend="xla")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    H, W = params.grid_h, params.grid_w
    Ws = W + 1
    cls = agent_class(params)
    A = params.num_agents
    rng = np.random.RandomState(1)
    pases, tgts, poss = [], [], []
    for seed in range(4):
        es = step_mod.reset(params, jax.random.PRNGKey(seed))
        agv_g, pick_g, _, _ = occupancy_grids(params, es)
        occ = (agv_g > 0) | (pick_g > 0)
        tgt_idx = rng.randint(params.num_goals, params.num_actions - 1, A)
        tgt = params.action_cells[jnp.asarray(tgt_idx)]
        self_yx = es.agent_xy[:, ::-1]
        pases.append(passable_walled(params, occ, tgt, self_yx, cls))
        tgts.append(tgt[:, 0] * Ws + tgt[:, 1])
        poss.append(self_yx[:, 0] * Ws + self_yx[:, 1])
    pas = jnp.concatenate(pases).astype(jnp.int32)
    tgt = jnp.concatenate(tgts).astype(jnp.int32)
    pos = jnp.concatenate(poss).astype(jnp.int32)
    iters = int(params.dynamic_bfs_iters)
    d_ref, nd_ref = _ref_query(pas, tgt, pos, H, W, iters)
    d_bp, nd_bp = bitpack_query_call(pas, tgt, pos, H, W, iters,
                                     rows_per_block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_bp))
    np.testing.assert_array_equal(np.asarray(nd_ref), np.asarray(nd_bp))


def test_bitpack_through_compaction_path():
    """bfs_query_occ_batched with kernel='bitpack32' equals the int32
    route bit-for-bit, compacted and uncompacted."""
    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.state import (
        agent_class,
        make_params,
        occupancy_grids,
    )
    from swarm_ode_tpu.ops.bfs_pallas import bfs_query_occ_batched

    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=4,
                    num_pickers=2, observation_type="partial",
                    bfs_backend="xla")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    H, W = params.grid_h, params.grid_w
    Ws = W + 1
    n = H * Ws
    cls = agent_class(params)
    A = params.num_agents
    rng = np.random.RandomState(2)
    occs, tgts, poss = [], [], []
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
    occ_w = jnp.stack(occs)
    tgt_w = jnp.stack(tgts).astype(jnp.int32)
    pos_w = jnp.stack(poss).astype(jnp.int32)
    pick_w = jnp.pad(params.picker_passable, ((0, 0), (0, 1))).reshape(n)
    need = jnp.asarray(rng.rand(5, A) < 0.4)
    iters = int(params.dynamic_bfs_iters)
    for frac in (1.0, 0.5):
        outs = {}
        for k in ("int32", "bitpack32"):
            outs[k] = bfs_query_occ_batched(
                occ_w, tgt_w, pos_w, cls, need, pick_w, H, W, iters,
                row_frac=frac, rows_per_block=8, interpret=True, kernel=k,
            )
        for a, b in zip(outs["int32"], outs["bitpack32"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bitpack_matches_int32_extralarge_width():
    """Ws = W+1 = 31 — the widest shipped geometry (extralarge 45x30) and
    the last value before the _plan() guard rejects. The cross-word carry
    shifts by 31/1 bits here, the extreme of the single-word-crossing
    assumption, so this width gets its own parity case (ADVICE r2: Ws>=32
    silently mis-pathfinds; 31 must stay exact)."""
    H, W = 12, 30  # full extralarge height is slow in interpret mode
    Ws = W + 1
    n = H * Ws
    rng = np.random.RandomState(7)
    K = 24
    pas2d = rng.rand(K, H, W) > 0.25
    pas = jnp.asarray(np.pad(pas2d, [(0, 0), (0, 0), (0, 1)]).reshape(K, n))
    ty, tx = rng.randint(0, H, K), rng.randint(0, W, K)
    py, px = rng.randint(0, H, K), rng.randint(0, W, K)
    tgt = jnp.asarray(ty * Ws + tx, jnp.int32)
    pos = jnp.asarray(py * Ws + px, jnp.int32)
    col = np.arange(n)[None, :]
    pasf = jnp.asarray(
        np.asarray(pas)
        | (col == np.asarray(tgt)[:, None])
        | (col == np.asarray(pos)[:, None])
    )
    iters = 30
    d_ref, nd_ref = _ref_query(pasf, tgt, pos, H, W, iters)
    d_bp, nd_bp = bitpack_query_call(pasf, tgt, pos, H, W, iters,
                                     rows_per_block=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_bp))
    np.testing.assert_array_equal(np.asarray(nd_ref), np.asarray(nd_bp))
