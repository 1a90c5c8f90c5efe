"""Measure per-step BFS-consumer row counts: how many agents per env per
step actually need dynamic BFS values (replan-followers), how many could
trigger a clash (superset: busy mover with an agent on a 4-neighbor cell),
and stuck c1 candidates. Sizes the compacted-BFS budget."""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from swarm_ode_tpu.config import EnvConfig
from swarm_ode_tpu.env.layout import build_layout
from swarm_ode_tpu.env.state import make_params
from swarm_ode_tpu.env import step as step_mod
from swarm_ode_tpu.policies import heuristic as H

STUCK_THRESHOLD = 5


def main():
    cfg = EnvConfig.from_env_id("tarware-medium-19agvs-9pickers-partialobs-v1")
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    B, T = 256, 500

    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, hs = carry
            x, y = es.agent_xy[:, 0], es.agent_xy[:, 1]
            # replan followers (pass-1 rows)
            n_replan = jnp.sum(es.agent_replan & es.agent_busy)
            # adjacency superset of potential clash triggers
            d1 = (
                jnp.abs(x[:, None] - x[None, :])
                + jnp.abs(y[:, None] - y[None, :])
            ) == 1
            near = jnp.any(d1, axis=1)
            n_near = jnp.sum(es.agent_busy & near)
            n_stuck = jnp.sum(es.agent_busy & (es.stuck_count > STUCK_THRESHOLD))
            n_union = jnp.sum(
                (es.agent_replan | near | (es.stuck_count > STUCK_THRESHOLD))
                & es.agent_busy
            )
            actions, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, actions)
            return (es, hs), (n_replan, n_near, n_stuck, n_union)

        _, outs = jax.lax.scan(body, (es, h), None, length=T)
        return outs

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    outs = jax.block_until_ready(run(keys))
    names = ["replan", "near(busy)", "stuck>thr", "union"]
    for nm, a in zip(names, outs):
        a = np.asarray(a, np.float64)  # (B, T)
        per_step_batch_sum = a.sum(axis=0)  # rows per batched step
        print(
            f"{nm:12s} mean/env={a.mean():6.2f}  p99(env)={np.percentile(a, 99):5.1f} "
            f"max(env)={a.max():4.0f}  batch-sum mean={per_step_batch_sum.mean():8.1f} "
            f"max={per_step_batch_sum.max():8.0f}  (B={B}, A={a.shape})"
        )


if __name__ == "__main__":
    main()
