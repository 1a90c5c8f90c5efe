"""Heuristic dispatcher unit tests (reference tarware/heuristic.py:26-146)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.policies import heuristic as H


@pytest.fixture(scope="module")
def setup():
    cfg = EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    return cfg, lay, params


def test_picker_zones_partition(setup):
    cfg, lay, params = setup
    zones = H.picker_zones(lay, cfg.num_pickers)
    assert zones.shape == (lay.num_racks,)
    assert set(zones.tolist()) <= set(range(cfg.num_pickers))
    # contiguous split of sections: zone of a cell == zone of its section
    for ridx in range(lay.num_racks):
        same_sec = lay.rack_group_action_order == lay.rack_group_action_order[ridx]
        assert len(set(zones[same_sec].tolist())) == 1


def test_initial_assignment_targets_requested_shelves(setup):
    cfg, lay, params = setup
    policy = H.make_policy(params, lay)
    es = step_mod.reset(params, jax.random.PRNGKey(0))
    h = H.init_state(params)
    actions, h2 = policy(params, es, h)
    actions = np.asarray(actions)
    G = params.num_goals
    rq_cells = set()
    sxy = np.asarray(es.shelf_xy)
    for s in np.asarray(es.request_queue):
        rq_cells.add((int(sxy[s - 1, 0]), int(sxy[s - 1, 1])))
    # every assigned AGV action targets a requested shelf's cell
    ac = np.asarray(params.action_cells)
    n_assigned = 0
    for i in range(cfg.num_agvs):
        a = actions[i]
        if a > G:
            ty, tx = ac[a - 1]
            assert (tx, ty) in rq_cells
            n_assigned += 1
    # all AGVs got work (queue size >> agvs)
    assert n_assigned == cfg.num_agvs
    # one item per AGV, no duplicates
    assert len(set(actions[:cfg.num_agvs].tolist())) == cfg.num_agvs
    # items marked reserved
    assert int((np.asarray(h2.agv_item) > 0).sum()) == cfg.num_agvs


def test_assignment_prefers_closest_agv(setup):
    cfg, lay, params = setup
    policy = H.make_policy(params, lay)
    es = step_mod.reset(params, jax.random.PRNGKey(0))
    h = H.init_state(params)
    _, h2 = policy(params, es, h)
    # First queue item must be served by the closest (Manhattan) AGV among
    # all (every AGV was free at assignment time).
    item0 = int(np.asarray(es.request_queue)[0])
    sxy = np.asarray(es.shelf_xy)[item0 - 1]
    axy = np.asarray(es.agent_xy)[: cfg.num_agvs]
    d = np.abs(axy - sxy[None]).sum(1)
    expect = int(np.argmin(d))
    served_by = int(np.argmax(np.asarray(h2.agv_item) == item0))
    assert served_by == expect


def test_mission_lifecycle_delivers(setup):
    """Running the dispatcher end-to-end produces deliveries and cycles
    missions back to NONE."""
    cfg, lay, params = setup
    policy = H.make_policy(params, lay)

    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, h = carry
            a, h = policy(params, es, h)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, h), (info["shelf_deliveries"], h.agv_mission)

        (es, h), (deliv, missions) = jax.lax.scan(
            body, (es, h), None, length=200
        )
        return deliv.sum(), missions

    deliv, missions = run(jax.random.PRNGKey(1))
    assert int(deliv) > 3
    m = np.asarray(missions)
    # all mission phases occur
    assert set(np.unique(m)) >= {H.NONE, H.PICKING, H.DELIVERING, H.RETURNING}


def test_heuristic_agent_only_env_delivers():
    """num_pickers=0 (AGENT self-loading agents, warehouse.py:171-175): the
    dispatcher runs without picker logic and still delivers."""
    cfg = EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=4, num_pickers=0,
                    observation_type="global")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)

    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, h = carry
            a, h = policy(params, es, h)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, h), info["shelf_deliveries"]

        (es, h), deliv = jax.lax.scan(body, (es, h), None, length=250)
        return deliv.sum()

    assert int(run(jax.random.PRNGKey(0))) > 5


def test_stochastic_dispatcher_valid_and_delivers(setup):
    """temperature>0 dispatcher: actions stay in range, missions cycle,
    deliveries happen, and different keys give different trajectories."""
    cfg, lay, params = setup
    policy = H.make_policy(params, lay, temperature=1.0)

    @jax.jit
    def run(key):
        kr, key = jax.random.split(key)
        es = step_mod.reset(params, kr)
        h = H.init_state(params)

        def body(carry, k):
            es, h = carry
            a, h = policy(params, es, h, k)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, h), (a, info["shelf_deliveries"])

        (es, h), (acts, deliv) = jax.lax.scan(
            body, (es, h), jax.random.split(key, 200)
        )
        return acts, deliv.sum()

    acts1, d1 = run(jax.random.PRNGKey(3))
    acts2, d2 = run(jax.random.PRNGKey(4))
    a1, a2 = np.asarray(acts1), np.asarray(acts2)
    assert a1.min() >= 0 and a1.max() <= params.num_actions - 1
    assert int(d1) > 3 and int(d2) > 3
    # stochastic: two keys must diverge somewhere
    assert (a1 != a2).any()


def test_stochastic_tiny_temperature_matches_argmin_off_ties(setup):
    """T<<1 only randomizes exact argmin ties: the sampled choice's
    distance equals the argmin distance."""
    cfg, lay, params = setup
    d = jnp.asarray([5.0, 3.0, 3.0, 9.0, jnp.inf])
    picks = set()
    for s in range(20):
        i = int(H._sampled_argmin(d, jax.random.PRNGKey(s), 1e-3))
        assert float(d[i]) == 3.0
        picks.add(i)
    assert picks == {1, 2}  # both ties get sampled
