"""Stateless expert oracle (policies/heuristic.reconstruct_state):
the dispatcher's bookkeeping re-derived from EnvState must reproduce the
threaded dispatcher — both per-action along its own trajectory and in
closed loop when the reconstruction drives the env itself."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.policies import heuristic as H


@pytest.fixture(scope="module", params=["tiny-3agvs-2pickers"])
def env(request):
    cfg = EnvConfig.from_env_id(f"tarware-{request.param}-partialobs-v1")
    lay = build_layout(cfg)
    return make_params(cfg, lay), lay


def _rollout(params, policy_fn, key, steps=200):
    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)

        def body(carry, _):
            es, h = carry
            a, h = policy_fn(es, h)
            es2, _, _, info = step_mod.step(params, es, a)
            return (es2, h), (a, info["shelf_deliveries"])

        (_, _), (acts, delivs) = jax.lax.scan(
            body, (es, H.init_state(params)), None, length=steps
        )
        return acts, delivs

    return run(key)


def test_stateless_matches_stateful_on_expert_trajectory(env):
    """Along the threaded dispatcher's own trajectory, the reconstruction
    must produce (near-)identical actions — only the picker age tie-break
    can differ, and on tiny it does not."""
    params, lay = env
    stateful = H.make_policy(params, lay)
    expert = H.make_stateless_expert(params, lay)

    @jax.jit
    def run(key):
        es = step_mod.reset(params, key)

        def body(carry, _):
            es, h = carry
            a, h2 = stateful(params, es, h)
            a_free = expert(params, es)
            es2, _, _, _ = step_mod.step(params, es, a)
            return (es2, h2), (a, a_free)

        (_, _), (a_seq, f_seq) = jax.lax.scan(
            body, (es, H.init_state(params)), None, length=200
        )
        return a_seq, f_seq

    a_seq, f_seq = run(jax.random.PRNGKey(0))
    agree = float((np.asarray(a_seq) == np.asarray(f_seq)).mean())
    assert agree > 0.97, f"action agreement {agree:.3f}"


def test_stateless_expert_closed_loop_quality(env):
    """Driving the env with per-step reconstruction loses (almost) no
    deliveries vs the threaded dispatcher."""
    params, lay = env
    stateful = H.make_policy(params, lay)
    expert = H.make_stateless_expert(params, lay)

    key = jax.random.PRNGKey(1)
    _, d_stateful = _rollout(
        params, lambda es, h: stateful(params, es, h), key, steps=300
    )
    _, d_free = _rollout(
        params, lambda es, h: (expert(params, es), h), key, steps=300
    )
    ds, df = int(np.sum(d_stateful)), int(np.sum(d_free))
    assert df >= 0.9 * ds, f"stateless {df} vs stateful {ds} deliveries"
