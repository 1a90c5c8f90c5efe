"""Measure the replan-rejoin throughput lever (config.replan_rejoin) on
chip: batched heuristic rollout steps/s + behavior stats.

The pallas replan kernel's cost is STATIC — it processes
ceil(replan_row_frac x batch rows) compacted rows per step no matter how
many rows actually need replanning (ops/bfs_pallas rows_per_block
pipeline). So the rejoin flag alone moves no throughput; its value is
shrinking the needed-row count so the compaction budget can be lowered
without overflow. This sweep therefore measures, per env:

  1. flag OFF at the shipping row_frac (baseline), and
  2. flag ON across descending row_fracs,

reporting steps/s, total replan_overflow (needed rows the budget
dropped — must stay ~0 for parity), replan rows/step, and behavior
stats. The round-3 profile put exact replanning at ~43% of medium step
time (VERDICT item 7: target >=230k steps/s, parity unchanged).

Prints one JSON line per (env, rejoin, row_frac) config.
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
p.add_argument("--row_fracs", type=float, nargs="*",
               default=[0.43, 0.3, 0.22, 0.15, 0.1])
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


def measure(env_id, rejoin, row_frac, B):
    cfg = dataclasses.replace(
        EnvConfig.from_env_id(env_id),
        replan_rejoin=rejoin, replan_row_frac=row_frac,
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
                info["replan_overflow"].sum(),
                es.agent_replan.sum(),
            )

        (es, h), outs = jax.lax.scan(body, (es, h), None, length=nsteps)
        return jax.tree.map(jnp.sum, outs)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    out = jax.tree.map(np.asarray, rollout(keys))  # compile + warmup
    t0 = time.time()
    out = jax.tree.map(np.asarray, rollout(keys))
    wall = time.time() - t0
    deliv, clash, stuck, ovf, rp = (int(v) for v in out)
    n_env_steps = B * nsteps
    print(json.dumps({
        "env": env_id, "rejoin": rejoin, "row_frac": row_frac, "batch": B,
        "steps_per_s": round(n_env_steps / wall),
        "deliveries_per_ep500": round(deliv / B * 500 / nsteps, 2),
        "clashes_per_ep500": round(clash / B * 500 / nsteps, 2),
        "stucks_per_ep500": round(stuck / B * 500 / nsteps, 2),
        "replan_overflow_total": ovf,
        "replan_rows_per_step": round(rp / nsteps / B, 3),
    }), flush=True)


for env_id in args.envs:
    B = args.batch if "extralarge" not in env_id else min(args.batch, 1024)
    measure(env_id, False, EnvConfig.from_env_id(env_id).replan_row_frac, B)
    for rf in args.row_fracs:
        measure(env_id, True, rf, B)
