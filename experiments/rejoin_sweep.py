"""Measure the replan-rejoin throughput lever (config.replan_rejoin) on
chip: batched heuristic rollout steps/s + behavior stats, flag off vs on.

The lever drops an agent out of always-replan mode once its dynamic BFS
field coincides with the static field at its own cell (env/step.py). The
hypothesis (round-3 VERDICT item 7): most replan-mode steps are stale
tails whose answers the static field already gives, and replanning is
~43% of medium step time.

Prints one JSON line per (env, flag) config.
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

p = argparse.ArgumentParser()
p.add_argument("--envs", nargs="*", default=[
    "tarware-medium-19agvs-9pickers-partialobs-v1",
    "tarware-large-15agvs-8pickers-partialobs-v1",
])
p.add_argument("--batch", type=int, default=2048)
p.add_argument("--steps", type=int, default=100)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.env import step as step_mod  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.policies import heuristic as H  # noqa: E402

for env_id in args.envs:
    B = args.batch if "extralarge" not in env_id else min(args.batch, 1024)
    for rejoin in (False, True):
        cfg = dataclasses.replace(
            EnvConfig.from_env_id(env_id), replan_rejoin=rejoin
        )
        lay = build_layout(cfg)
        params = make_params(cfg, lay)
        policy = H.make_policy(params, lay)

        nsteps = args.steps

        @jax.jit
        def rollout(keys):
            es = jax.vmap(step_mod.reset, in_axes=(None, 0))(params, keys)
            h = jax.vmap(lambda _: H.init_state(params))(keys)

            def body(carry, _):
                es, h = carry
                a, h = jax.vmap(policy, in_axes=(None, 0, 0))(params, es, h)
                es, rew, done, info = jax.vmap(
                    step_mod.step, in_axes=(None, 0, 0)
                )(params, es, a)
                return (es, h), (
                    info["shelf_deliveries"].sum(),
                    info["clashes"].sum(),
                    info["stucks"].sum(),
                    es.agent_replan.sum(),
                )

            (es, h), outs = jax.lax.scan(body, (es, h), None, length=nsteps)
            return jax.tree.map(jnp.sum, outs)

        keys = jax.random.split(jax.random.PRNGKey(0), B)
        # compile + warmup
        out = jax.tree.map(
            np.asarray, rollout(keys, jnp.int32(args.steps))
        )
        t0 = time.time()
        out = jax.tree.map(np.asarray, rollout(keys, jnp.int32(args.steps)))
        wall = time.time() - t0
        deliv, clash, stuck, rp = (int(v) for v in out)
        n_env_steps = B * args.steps
        print(json.dumps({
            "env": env_id, "rejoin": rejoin, "batch": B,
            "steps_per_s": round(n_env_steps / wall),
            "deliveries_per_ep500": round(deliv / B * 500 / args.steps, 2),
            "clashes_per_ep500": round(clash / B * 500 / args.steps, 2),
            "stucks_per_ep500": round(stuck / B * 500 / args.steps, 2),
            "replan_rows_per_step": round(rp / args.steps / B, 3),
        }), flush=True)
