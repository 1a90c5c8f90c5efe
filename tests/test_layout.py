"""Layout geometry tests against values derived from the reference code.

Expected numbers are computed by hand from tarware/warehouse.py:215-259 and
tarware/__init__.py:10-24 (sizes, request queues, column_height=8).
"""
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.definitions import Direction
from swarm_ode_tpu.env.layout import INF, build_layout


def cfg(size_rows, size_cols, agvs=2, pickers=1):
    return EnvConfig(shelf_rows=size_rows, shelf_columns=size_cols,
                     num_agvs=agvs, num_pickers=pickers)


# (shelf_rows, shelf_cols) -> (H, W, num_racks, num_goals)
EXPECTED = {
    (1, 3): (15, 14, 48, 6),      # tiny: H=2+10*1+3, W=2+4*3
    (2, 3): (25, 14, 96, 6),      # small
    (2, 5): (25, 22, 160, 10),    # medium
    (3, 5): (35, 22, 240, 10),    # large
    (4, 7): (45, 30, 448, 14),    # extralarge
}


@pytest.mark.parametrize("rows,cols", sorted(EXPECTED))
def test_geometry(rows, cols):
    H, W, L, G = EXPECTED[(rows, cols)]
    lay = build_layout(cfg(rows, cols))
    assert lay.grid_size == (H, W)
    assert lay.num_racks == L
    assert lay.num_goals == G
    assert lay.num_actions == 1 + G + L
    # Shelves spawn on every non-highway cell; non-highway == rack cells.
    assert lay.num_shelves == L
    assert set(map(tuple, lay.shelf_cells_yx)) == set(map(tuple, lay.rack_cells_yx))
    # Goals sit on the last row and on highway cells.
    assert np.all(lay.goals_yx[:, 0] == H - 1)
    assert np.all(lay.highway[lay.goals_yx[:, 0], lay.goals_yx[:, 1]])
    # Rack cells are never highway.
    assert not np.any(lay.highway[lay.rack_cells_yx[:, 0], lay.rack_cells_yx[:, 1]])


def test_sections_are_aisles():
    lay = build_layout(cfg(2, 5))
    # medium: 2 row-blocks x 5 rack-columns = 10 sections of 2*8 cells each.
    assert lay.num_groups == 10
    counts = np.bincount(lay.rack_group_action_order)
    assert np.all(counts == 16)
    # obs_rack_perm is a permutation of rack indices.
    assert sorted(lay.obs_rack_perm.tolist()) == list(range(lay.num_racks))
    # rack_locations (x, y, group) consistent with the permutation.
    for k, ridx in enumerate(lay.obs_rack_perm):
        y, x = lay.rack_cells_yx[ridx]
        assert tuple(lay.rack_locations_xyg[k][:2]) == (x, y)
        assert lay.rack_locations_xyg[k][2] == lay.rack_group_action_order[ridx]


def test_agv_field_is_manhattan():
    lay = build_layout(cfg(1, 3))
    H, W = lay.grid_size
    # AGVs plan on a free grid -> BFS distance == Manhattan distance.
    t = 7  # some rack target
    ty, tx = lay.action_cells_yx[t]
    ys, xs = np.mgrid[0:H, 0:W]
    manhattan = np.abs(ys - ty) + np.abs(xs - tx)
    assert np.array_equal(lay.field_dist[0, t], manhattan)


def test_field_descends_to_target():
    """Following next_dir from any cell reaches the target in dist steps."""
    lay = build_layout(cfg(1, 3))
    dydx = {Direction.UP: (-1, 0), Direction.DOWN: (1, 0),
            Direction.LEFT: (0, -1), Direction.RIGHT: (0, 1)}
    rng = np.random.RandomState(0)
    for cls in (0, 1):
        for _ in range(50):
            t = rng.randint(lay.action_cells_yx.shape[0])
            y = rng.randint(lay.grid_size[0])
            x = rng.randint(lay.grid_size[1])
            d = lay.field_dist[cls, t, y, x]
            if d >= INF:
                continue
            steps = 0
            while (y, x) != tuple(lay.action_cells_yx[t]):
                nd = lay.field_next_dir[cls, t, y, x]
                assert nd >= 0
                dy, dx = dydx[Direction(nd)]
                y, x = y + dy, x + dx
                steps += 1
                assert steps <= d
            assert steps == d


def test_picker_field_respects_highways():
    lay = build_layout(cfg(1, 3))
    H, W = lay.grid_size
    # Pick a rack target; every passable cell on a shortest path (other than
    # the target itself) must be highway and not on the last row.
    t = lay.num_goals + 3
    ty, tx = lay.action_cells_yx[t]
    dydx = {Direction.UP: (-1, 0), Direction.DOWN: (1, 0),
            Direction.LEFT: (0, -1), Direction.RIGHT: (0, 1)}
    y, x = 0, 0  # top-left corner is highway
    assert lay.highway[y, x]
    while (y, x) != (ty, tx):
        nd = lay.field_next_dir[1, t, y, x]
        dy, dx = dydx[Direction(nd)]
        y, x = y + dy, x + dx
        if (y, x) != (ty, tx):
            assert lay.picker_passable[y, x], (y, x)


def test_picker_rack_crossing_ban():
    """A picker on a rack cell with target the adjacent same-row rack cell
    must step sideways onto the highway, not cross directly
    (reference warehouse.py:294-303)."""
    lay = build_layout(cfg(1, 3))
    # Find a rack cell pair (same row, adjacent x).
    found = False
    for t, (ty, tx) in enumerate(lay.action_cells_yx):
        if lay.highway[ty, tx]:
            continue
        for sx in (tx - 1, tx + 1):
            if 0 <= sx < lay.grid_size[1] and not lay.highway[ty, sx] \
               and not lay.is_goal_grid[ty, sx]:
                nd = lay.field_next_dir[1, t, ty, sx]
                # Must move sideways to a highway cell, not straight across.
                assert nd in (Direction.LEFT, Direction.RIGHT)
                dx = -1 if nd == Direction.LEFT else 1
                assert lay.highway[ty, sx + dx]
                assert sx + dx != tx
                # Distance is the long way around (> 1).
                assert lay.field_dist[1, t, ty, sx] > 1
                found = True
    assert found
