"""Headline benchmark: batched env steps/sec with the heuristic dispatcher.

Prints ONE JSON line:
  {"metric": "batched_env_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N / 261.4}

Baseline: the reference's single-process heuristic rollout on
tarware-medium-19agvs-9pickers-partialobs-v1 averages 261.4 env steps/s on
CPU (results/heuristic-medium-19agvs-9pickers-partialobs.xlsx, col G;
BASELINE.md). Same env config, same policy, same 500-step episodes here —
vmapped across a batch on one TPU chip.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS = 261.4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--replan_mode", default="bfs", choices=["bfs", "greedy", "off"])
    ap.add_argument("--bfs_kernel", default="auto",
                    choices=["auto", "int32", "bitpack32"])
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.state import make_params
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.policies import heuristic as H

    cfg = EnvConfig.from_env_id(args.env_id, replan_mode=args.replan_mode,
                                bfs_kernel=args.bfs_kernel)
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)

    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, hs = carry
            actions, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, actions)
            return (es, hs), (info["shelf_deliveries"], rew.sum())

        (es, hs), (deliv, rew) = jax.lax.scan(
            body, (es, h), None, length=args.steps
        )
        return deliv.sum(), rew.sum()

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), args.batch)
    t0 = time.time()
    out = run(keys)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    best = 0.0
    for r in range(args.repeats):
        keys = jax.random.split(jax.random.PRNGKey(r + 1), args.batch)
        t0 = time.time()
        out = run(keys)
        jax.block_until_ready(out)
        dt = time.time() - t0
        best = max(best, args.batch * args.steps / dt)
        if args.verbose:
            d = float(np.asarray(out[0]).mean()) * 500 / args.steps
            print(
                f"# repeat {r}: {args.batch * args.steps / dt:,.0f} steps/s "
                f"(deliveries/episode ~{d:.1f}; compile was {compile_s:.0f}s)"
            )

    print(
        json.dumps(
            {
                "metric": "batched_env_steps_per_sec",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / REFERENCE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
