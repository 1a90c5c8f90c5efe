"""Native C++ A* / BFS vs the layout BFS fields (host-path parity,
SURVEY.md §2.7)."""
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.layout import INF, build_layout

astar = pytest.importorskip("swarm_ode_tpu.utils.astar")


def test_astar_simple_grid():
    w = np.ones((5, 5), np.float32)
    path = astar.astar_path(w, (0, 0), (4, 4))
    assert path is not None
    assert tuple(path[0]) == (0, 0) and tuple(path[-1]) == (4, 4)
    assert len(path) == 9  # manhattan + 1 (includes start)
    # consecutive cells are 4-adjacent
    d = np.abs(np.diff(path, axis=0)).sum(axis=1)
    assert np.all(d == 1)


def test_astar_respects_walls():
    w = np.ones((3, 5), np.float32)
    w[1, :4] = np.inf  # wall with a gap at x=4
    path = astar.astar_path(w, (0, 0), (2, 0))
    assert path is not None
    assert len(path) == 11  # around the wall
    # blocked cells never on path
    for y, x in path:
        assert np.isfinite(w[y, x])


def test_astar_unreachable():
    w = np.ones((3, 3), np.float32)
    w[1, :] = np.inf
    assert astar.astar_path(w, (0, 0), (2, 2)) is None


def test_astar_matches_layout_bfs_distances():
    """A* path length - 1 == BFS distance on the picker grid for every
    reachable (cell, target) pair sampled."""
    lay = build_layout(EnvConfig(shelf_rows=1, shelf_columns=3,
                                 num_agvs=2, num_pickers=1))
    H, W = lay.grid_size
    rng = np.random.RandomState(0)
    for _ in range(25):
        t = rng.randint(lay.action_cells_yx.shape[0])
        ty, tx = lay.action_cells_yx[t]
        # picker-class grid: impassable cells get inf, target freed
        w = np.where(lay.picker_passable, 1.0, np.inf).astype(np.float32)
        w[ty, tx] = 1.0
        sy, sx = rng.randint(H), rng.randint(W)
        if not lay.picker_passable[sy, sx]:
            continue
        path = astar.astar_path(w, (sy, sx), (ty, tx))
        d = lay.field_dist[1, t, sy, sx]
        if path is None:
            assert d >= INF
        else:
            assert len(path) - 1 == d, ((sy, sx), (ty, tx))


def test_native_bfs_matches_layout():
    lay = build_layout(EnvConfig(shelf_rows=1, shelf_columns=3,
                                 num_agvs=2, num_pickers=1))
    free = np.ones(lay.grid_size, bool)
    dist = astar.bfs_fields(free, lay.action_cells_yx[:5])
    np.testing.assert_array_equal(dist, lay.field_dist[0, :5])
