"""Basic env mechanics: reset validity, step invariants, determinism, vmap
consistency (SURVEY.md §4 test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.definitions import AgentType
from swarm_ode_tpu.env.env import WarehouseEnv
from swarm_ode_tpu.env.state import occupancy_grids
from swarm_ode_tpu.env import observations


@pytest.fixture(scope="module")
def env():
    return WarehouseEnv(EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1"))


def test_reset_spawns_on_highway(env):
    obs, state = env.reset(jax.random.PRNGKey(0))
    p = env.params
    x, y = state.agent_xy[:, 0], state.agent_xy[:, 1]
    assert np.all(np.asarray(p.highway[y, x]))
    # unique agent cells
    cells = np.asarray(y * p.grid_w + x)
    assert len(set(cells.tolist())) == p.num_agents
    # request queue: unique shelf ids in range
    rq = np.asarray(state.request_queue)
    assert len(set(rq.tolist())) == p.request_queue_size
    assert rq.min() >= 1 and rq.max() <= p.num_shelves
    # obs shape
    agv_len, picker_len = observations.obs_lengths(p)
    assert obs.shape == (p.num_agents, max(agv_len, picker_len))


def test_obs_lengths_match_reference_formulas(env):
    p = env.params
    agv_len, picker_len = observations.obs_lengths(p)
    A, P, L = p.num_agvs, p.num_pickers, p.num_racks
    assert agv_len == 3 + 4 * A + 4 * P + 2 * L
    assert picker_len == 7 * A + 4 * P


def random_macro_rollout(env, steps=50, seed=0):
    obs, state = env.reset(jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 1)
    states = [state]
    for t in range(steps):
        key, sub = jax.random.split(key)
        masks = env.action_masks(state)
        # sample a valid action per agent
        logits = jnp.where(masks > 0, 0.0, -1e9)
        actions = jax.random.categorical(sub, logits, axis=-1)
        obs, state, rew, done, info = env.step(state, actions)
        states.append(state)
    return states


def test_step_invariants(env):
    p = env.params
    states = random_macro_rollout(env, steps=60)
    for state in states[1:]:
        x, y = np.asarray(state.agent_xy[:, 0]), np.asarray(state.agent_xy[:, 1])
        assert (x >= 0).all() and (x < p.grid_w).all()
        assert (y >= 0).all() and (y < p.grid_h).all()
        # carried shelves are carried by at most one agent
        carrying = np.asarray(state.agent_carrying)
        nz = carrying[carrying > 0]
        assert len(set(nz.tolist())) == len(nz)
        # shelf count conserved: every shelf either on a cell or carried
        agv_g, pick_g, shelf_g, carried_g = map(np.asarray, occupancy_grids(p, state))
        n_on_grid = (shelf_g > 0).sum()
        assert n_on_grid + len(nz) == p.num_shelves
        # request queue entries always valid shelf ids
        rq = np.asarray(state.request_queue)
        assert rq.min() >= 1 and rq.max() <= p.num_shelves
        assert len(set(rq.tolist())) == p.request_queue_size


def test_determinism(env):
    s1 = random_macro_rollout(env, steps=30, seed=3)[-1]
    s2 = random_macro_rollout(env, steps=30, seed=3)[-1]
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_vmap_matches_single(env):
    """Batched step == N independent single steps (SURVEY.md §4)."""
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    obs_b, state_b = env.reset_batch(keys)
    # random valid actions per env
    masks = jax.vmap(lambda s: env.action_masks(s))(state_b)
    logits = jnp.where(masks > 0, 0.0, -1e9)
    actions = jax.random.categorical(jax.random.PRNGKey(9), logits, axis=-1)
    obs_b2, state_b2, rew_b, done_b, info_b = env.step_batch(state_b, actions)
    for i in range(B):
        obs_i, state_i = env.reset(keys[i])
        obs_s, state_s, rew_s, done_s, info_s = env.step(
            jax.tree.map(lambda l: l[i], state_b), actions[i]
        )
        np.testing.assert_allclose(np.asarray(rew_b[i]), np.asarray(rew_s))
        np.testing.assert_array_equal(
            np.asarray(state_b2.agent_xy[i]), np.asarray(state_s.agent_xy)
        )
        np.testing.assert_allclose(np.asarray(obs_b2[i]), np.asarray(obs_s))


def test_agent_only_env():
    """num_pickers=0 -> AGENT type agents that self-load."""
    env = WarehouseEnv(EnvConfig(shelf_rows=1, shelf_columns=3, num_agvs=3,
                                 num_pickers=0, observation_type="global"))
    assert np.all(np.asarray(env.params.agent_type) == AgentType.AGENT)
    states = random_macro_rollout(env, steps=40, seed=5)
    # AGENTs should manage to pick up shelves without pickers
    picked = any(np.asarray(s.agent_carrying).sum() > 0 for s in states)
    assert picked


def test_auto_reset_rollout(env):
    """Episodes restart in place on done; step counter never exceeds
    max_steps."""
    from swarm_ode_tpu.env.env import auto_reset_rollout
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.policies import heuristic as H

    p = env.params
    lay = build_layout(env.config)
    policy = H.make_policy(p, lay)

    @jax.jit
    def run(key):
        es = step_mod.reset(p, key)
        h = H.init_state(p)
        es, h, key2, (rew, done, info) = auto_reset_rollout(
            p, policy, lambda: H.init_state(p), es, h, 1100, key
        )
        return es, done

    es, done = run(jax.random.PRNGKey(0))
    done = np.asarray(done)
    # max_steps=500 -> exactly two episode boundaries in 1100 steps
    assert done.sum() == 2
    assert int(es.cur_steps) == 1100 - (np.nonzero(done)[0].max() + 1)
