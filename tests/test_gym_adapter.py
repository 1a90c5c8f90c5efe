"""Gym adapter API parity with the reference Warehouse (warehouse.py:91-766)."""
import numpy as np
import pytest

import swarm_ode_tpu


@pytest.fixture(scope="module")
def env():
    return swarm_ode_tpu.make("tarware-tiny-3agvs-2pickers-partialobs-v1")


def test_reset_returns_bare_obs_tuple(env):
    """Reference quirk: reset returns just the obs tuple, no info
    (warehouse.py:666)."""
    out = env.reset(seed=0)
    assert isinstance(out, tuple)
    assert len(out) == env.num_agents
    assert all(isinstance(o, np.ndarray) for o in out)


def test_step_returns_terminateds_twice(env):
    """Reference quirk: terminated and truncated are the same list
    (warehouse.py:704)."""
    env.reset(seed=0)
    obs, rew, term, trunc, info = env.step([0] * env.num_agents)
    assert term == trunc
    assert len(term) == env.num_agents
    assert len(rew) == env.num_agents


def test_episode_terminates_at_max_steps(env):
    env.reset(seed=1)
    for t in range(env.params.max_steps):
        obs, rew, term, trunc, info = env.step([0] * env.num_agents)
    assert all(term)


def test_action_coords_map_matches_reference_format(env):
    # {action_id: (y, x)}, goals first (warehouse.py:249-256)
    m = env.action_id_to_coords_map
    assert sorted(m.keys()) == list(range(1, env.action_size))
    for gid in range(1, env.params.num_goals + 1):
        y, x = m[gid]
        assert (x, y) in env.goals
    # goals are (x, y) tuples on the last row
    assert all(y == env.grid_size[0] - 1 for (x, y) in env.goals)


def test_request_queue_shelf_views(env):
    env.reset(seed=2)
    rq = env.request_queue
    assert len(rq) == env.params.request_queue_size
    for s in rq:
        assert 1 <= s.id <= env.params.num_shelves
        # requested shelves sit on rack cells
        assert not env.layout.highway[s.y, s.x]


def test_masks_and_info_queries(env):
    env.reset(seed=3)
    masks = env.compute_valid_action_masks()
    assert masks.shape == (env.num_agents, env.action_size)
    req = env.get_shelf_request_information()
    empty = env.get_empty_shelf_information()
    assert req.shape == (env.params.num_racks,)
    # requested and empty are disjoint
    assert not np.any((req > 0) & (empty > 0))
    carrying = env.get_carrying_shelf_information()
    assert carrying == [False] * env.num_agvs


def test_heuristic_episode_function(env):
    from swarm_ode_tpu.policies.heuristic import heuristic_episode

    infos, global_ret, ep_returns = heuristic_episode(env, seed=0)
    assert len(infos) == env.params.max_steps
    assert ep_returns.shape == (env.num_agents,)
    total_deliveries = sum(i["shelf_deliveries"] for i in infos)
    assert total_deliveries > 3
    assert abs(global_ret - ep_returns.sum()) < 1e-3
