"""Handcrafted move-conflict scenarios validating the array-form rules in
env/step.py Phase 2 against the reference semantics (warehouse.py:407-484).

Each test builds an explicit EnvState with agents mid-mission and checks
the post-step positions/flags.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.definitions import Action, AgentType, Direction
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params


@pytest.fixture(scope="module")
def setup():
    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=3, num_pickers=1,
                    observation_type="partial", bfs_backend="xla")
    lay = build_layout(cfg)
    return cfg, lay, make_params(cfg, lay)


def base_state(params, key=0):
    return step_mod.reset(params, jax.random.PRNGKey(key))


def place(state, idx, x, y, dir=Direction.RIGHT, busy=False, target=0):
    s = state
    s = s.replace(
        agent_xy=s.agent_xy.at[idx].set(jnp.array([x, y], jnp.int32)),
        agent_dir=s.agent_dir.at[idx].set(int(dir)),
        agent_busy=s.agent_busy.at[idx].set(busy),
        agent_target=s.agent_target.at[idx].set(target),
        stuck_xy=s.stuck_xy.at[idx].set(jnp.array([x, y], jnp.int32)),
    )
    return s


def action_id_of(params, x, y):
    cells = np.asarray(params.action_cells)
    hits = np.where((cells[:, 0] == y) & (cells[:, 1] == x))[0]
    assert len(hits) == 1
    return int(hits[0]) + 1


def park_far(state, params, indices):
    """Park agents in distinct far corners so they don't interfere."""
    spots = [(0, 0), (1, 0), (0, 1), (13, 0), (12, 0), (13, 1)]
    for k, i in enumerate(indices):
        state = place(state, i, *spots[k])
    return state


def test_swap_deadlock_blocks_both(setup):
    """Two AGVs facing each other on a highway row must both hold (len-2
    cycles are physically impossible, warehouse.py:420-423)."""
    cfg, lay, params = setup
    s = base_state(params)
    s = park_far(s, params, [2, 3])
    # On rack row y=2 (same-row targets force horizontal moves under the
    # vertical-first tie-break): AGV0 at (4,2) heading RIGHT to (6,2);
    # AGV1 at (5,2) heading LEFT to (3,2). Head-on swap attempt.
    t0 = action_id_of(params, 6, 2)
    t1 = action_id_of(params, 3, 2)
    s = place(s, 0, 4, 2, Direction.RIGHT, busy=True, target=t0)
    s = place(s, 1, 5, 2, Direction.LEFT, busy=True, target=t1)
    s2, rew, done, info = step_mod.step(params, s, jnp.zeros(params.num_agents, jnp.int32))
    xy = np.asarray(s2.agent_xy)
    # the swap must not happen
    assert not (tuple(xy[0]) == (5, 2) and tuple(xy[1]) == (4, 2))
    # both blocked in place this step; clash machinery engaged
    assert tuple(xy[0]) == (4, 2) and tuple(xy[1]) == (5, 2)
    assert int(info["clashes"]) >= 1


def test_accordion_follow(setup):
    """A follower moving into an occupied cell waits even if the occupant
    moves away this step (warehouse.py:462-463)."""
    cfg, lay, params = setup
    s = base_state(params)
    s = park_far(s, params, [2, 3])
    # Both AGVs heading RIGHT along rack row y=2: A1 in front at (5,2),
    # A0 behind at (4,2). Same-row targets keep motion horizontal.
    t = action_id_of(params, 10, 2)
    t2 = action_id_of(params, 11, 2)
    s = place(s, 0, 4, 2, Direction.RIGHT, busy=True, target=t)
    s = place(s, 1, 5, 2, Direction.RIGHT, busy=True, target=t2)
    s2, *_ = step_mod.step(params, s, jnp.zeros(params.num_agents, jnp.int32))
    xy = np.asarray(s2.agent_xy)
    # Leader advanced; follower held (accordion), regardless of leader move.
    assert tuple(xy[1]) == (6, 2)
    assert tuple(xy[0]) == (4, 2)


def test_same_destination_yield(setup):
    """Two movers contending for one empty cell: exactly one enters
    (warehouse.py:474-478); the yielder enters fixing-clash mode."""
    cfg, lay, params = setup
    s = base_state(params)
    s = park_far(s, params, [2, 3])
    # Both want (5,2): A0 at (4,2) moving RIGHT toward (6,2); A1 at (5,1)
    # moving DOWN toward rack (6,5) (vertical-first next hop is (5,2)).
    t0 = action_id_of(params, 6, 2)
    t1 = action_id_of(params, 6, 5)
    s = place(s, 0, 4, 2, Direction.RIGHT, busy=True, target=t0)
    s = place(s, 1, 5, 1, Direction.DOWN, busy=True, target=t1)
    s2, rew, done, info = step_mod.step(params, s, jnp.zeros(params.num_agents, jnp.int32))
    xy = np.asarray(s2.agent_xy)
    occupied_52 = [i for i in range(2) if tuple(xy[i]) == (5, 2)]
    assert len(occupied_52) == 1  # exactly one entered
    loser = 1 - occupied_52[0]
    assert int(s2.agent_fixing_clash[loser]) > 0


def test_picker_steps_over_agv_on_rack(setup):
    """Cross-type overlap is allowed on rack cells: a picker may enter a
    rack cell occupied by an AGV (warehouse.py:454-460)."""
    cfg, lay, params = setup
    s = base_state(params)
    s = park_far(s, params, [1, 2])
    # Rack cell (2,2). AGV0 parked there (toggling), picker (idx 3) adjacent
    # on highway (1,2), targeting the rack cell.
    t = action_id_of(params, 2, 2)
    s = place(s, 0, 2, 2, Direction.RIGHT, busy=True, target=t)
    s = place(s, 3, 1, 2, Direction.RIGHT, busy=True, target=t)
    s2, *_ = step_mod.step(params, s, jnp.zeros(params.num_agents, jnp.int32))
    xy = np.asarray(s2.agent_xy)
    # The AGV toggles at the rack (req TOGGLE) so the picker moves in.
    assert tuple(xy[3]) == (2, 2)
    assert tuple(xy[0]) == (2, 2)


def test_agv_blocked_by_agv_on_rack(setup):
    """Same-type occupancy blocks everywhere, including rack cells."""
    cfg, lay, params = setup
    s = base_state(params)
    s = park_far(s, params, [2, 3])
    t = action_id_of(params, 2, 2)
    # AGV1 parked ON the rack target; AGV0 adjacent trying to enter.
    s = place(s, 1, 2, 2, Direction.RIGHT, busy=True, target=t)
    s = place(s, 0, 1, 2, Direction.RIGHT, busy=True, target=t)
    s2, rew, done, info = step_mod.step(params, s, jnp.zeros(params.num_agents, jnp.int32))
    xy = np.asarray(s2.agent_xy)
    assert tuple(xy[0]) == (1, 2)  # blocked
    assert int(info["clashes"]) >= 1  # bump into a stationary agent
