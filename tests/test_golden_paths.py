"""Exact-path golden tests: device BFS next-hops reproduce native A* paths
(SURVEY.md §2.7: 'deterministic tie-breaking must match recorded
trajectories where parity is claimed'; reference A* call contract at
/root/reference/tarware/warehouse.py:261-317).

On unit-cost grids BFS == A*: both yield shortest paths. The device replan
query exposes only next-hops at the agent's own cell, so the test WALKS the
next-hop field step by step (re-querying at each cell, exactly what the env
does across steps) and asserts the walked path:
  * has length == native A* path length (both optimal),
  * is a strict BFS descent (distance falls by 1 per hop),
  * agrees with A* cell-for-cell when the descent direction is unique.
Unreachable targets must agree as None <-> INF.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import pathfinding as pf
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params

astar = pytest.importorskip("swarm_ode_tpu.utils.astar")

# (dy, dx) per Direction code, matching pathfinding._NBR_DIR order
DIR_DYDX = {0: (-1, 0), 1: (1, 0), 2: (0, -1), 3: (0, 1)}


def _weights(passable):
    w = np.ones(passable.shape, np.float32)
    w[~passable] = np.inf
    return w


def _walk_device_path(params, occ, tgt_yx, start_yx, cls, max_len=600):
    """Follow the device replan query from start to target; returns the
    visited (y, x) list (incl. start) or None if the first query says INF."""
    path = [tuple(int(v) for v in start_yx)]
    cur = np.asarray(start_yx, np.int32)
    for _ in range(max_len):
        d, nd, _ = pf.replan_query(
            params,
            jnp.asarray(occ),
            jnp.asarray(tgt_yx, jnp.int32)[None, :],
            jnp.asarray(cur, jnp.int32)[None, :],
            jnp.asarray([cls], jnp.int32),
        )
        d, nd = int(d[0]), int(nd[0])
        if d >= int(pf.INF32):
            return None if len(path) == 1 else path  # dead end mid-walk
        if d == 0:
            return path
        dy, dx = DIR_DYDX[nd]
        cur = np.array([cur[0] + dy, cur[1] + dx], np.int32)
        path.append((int(cur[0]), int(cur[1])))
    raise AssertionError("walk did not terminate")


def test_device_bfs_walk_matches_native_astar():
    # backend 'xla' here; pallas == xla equivalence is pinned separately by
    # tests/test_replan_query.py (interpret mode) and on-chip by
    # experiments/tpu_validation.py.
    # Full-coverage sweep count: the equivalence claim is BFS == A* given
    # enough relaxation sweeps (the production auto default trades tail
    # coverage for speed, validated behaviorally in
    # experiments/bfs_iters_large.py — random 25% occupancy here produces
    # far more winding paths than live agent traffic does).
    cfg = EnvConfig.from_env_id(
        "tarware-medium-19agvs-9pickers-partialobs-v1",
        bfs_backend="xla",
        dynamic_bfs_iters=35 * 23,
    )
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    H, W = params.grid_h, params.grid_w
    rng = np.random.RandomState(42)
    free = np.ones((H, W), bool)
    picker_pass = np.asarray(lay.picker_passable)

    checked_reachable = 0
    checked_unreachable = 0
    for trial in range(12):
        # Seeded random occupancy (agents as obstacles), random class.
        occ = rng.rand(H, W) < 0.25
        cls = int(rng.rand() < 0.4)
        base = picker_pass if cls else free
        # Random start/target on class-passable cells.
        ys, xs = np.nonzero(base)
        i, j = rng.randint(len(ys)), rng.randint(len(ys))
        start = np.array([ys[i], xs[i]], np.int32)
        tgt = np.array([ys[j], xs[j]], np.int32)
        if (start == tgt).all():
            continue

        # Native A* on the equivalent weight grid: class-passable minus
        # agents, with target and start freed (warehouse.py:285,:303).
        passable = base & ~occ
        passable[tgt[0], tgt[1]] = True
        passable[start[0], start[1]] = True
        ref_path = astar.astar_path(
            _weights(passable), tuple(start), tuple(tgt)
        )

        dev_path = _walk_device_path(params, occ, tgt, start, cls)

        if ref_path is None:
            assert dev_path is None, f"trial {trial}: A* unreachable, BFS not"
            checked_unreachable += 1
            continue
        assert dev_path is not None, f"trial {trial}: BFS unreachable, A* not"
        assert len(dev_path) == len(ref_path), (
            f"trial {trial}: walked length {len(dev_path)} != A* "
            f"{len(ref_path)} (both must be optimal)"
        )
        assert dev_path[-1] == tuple(tgt)
        # Strict descent + agreement where the descent is unique: recompute
        # the full distance field from the target and check both paths.
        dist, pas2 = pf.dynamic_fields(
            params,
            jnp.asarray(occ),
            jnp.asarray(tgt, jnp.int32)[None, :],
            jnp.asarray(start, jnp.int32)[None, :],
            jnp.asarray([cls], jnp.int32),
        )
        dist = np.asarray(dist[0])
        for path in (dev_path, [tuple(p) for p in ref_path]):
            ds = [dist[y, x] for y, x in path]
            assert ds[-1] == 0
            assert all(a - 1 == b for a, b in zip(ds[:-1], ds[1:])), (
                f"trial {trial}: non-descending path {ds}"
            )
        checked_reachable += 1

    assert checked_reachable >= 6 and checked_unreachable >= 1


def test_static_field_nextdir_tiebreak_matches_walk():
    """Static picker fields (layout precompute) produce walks that native A*
    confirms optimal, for every goal target from sampled cells."""
    cfg = EnvConfig.from_env_id("tarware-small-6agvs-3pickers-partialobs-v1")
    lay = build_layout(cfg)
    H, W = lay.grid_size
    picker_pass = np.asarray(lay.picker_passable)
    dist = np.asarray(lay.field_dist[1])  # picker class
    nd = np.asarray(lay.field_next_dir[1])
    rng = np.random.RandomState(7)
    ys, xs = np.nonzero(picker_pass)
    for t in rng.choice(dist.shape[0], 10, replace=False):
        ty, tx = lay.action_cells_yx[t]
        passable = picker_pass.copy()
        passable[ty, tx] = True
        for _ in range(5):
            k = rng.randint(len(ys))
            y, x = int(ys[k]), int(xs[k])
            if dist[t, y, x] >= np.int32(1 << 28):
                assert astar.astar_path(
                    _weights(passable), (y, x), (int(ty), int(tx))
                ) is None
                continue
            ref = astar.astar_path(
                _weights(passable), (y, x), (int(ty), int(tx))
            )
            assert ref is not None and len(ref) - 1 == dist[t, y, x]
            # walk the static next-dir field
            cy, cx = y, x
            steps = 0
            while (cy, cx) != (int(ty), int(tx)):
                dy, dx = DIR_DYDX[int(nd[t, cy, cx])]
                cy, cx = cy + dy, cx + dx
                steps += 1
                assert steps <= len(ref)
            assert steps == len(ref) - 1
