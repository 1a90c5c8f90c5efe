"""Behavioral parity evaluation vs the reference's committed results.

The reference's only quantitative artifact is
results/heuristic-medium-19agvs-9pickers-partialobs.xlsx: 30 heuristic
episodes on the medium env (SURVEY.md §6). This script runs the same
experiment here (30 seeded 500-step episodes, same env id, same policy) and
prints both distributions side by side.
"""
import json
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

# Reference xlsx statistics (mean, min, max over 30 episodes; SURVEY.md §6).
REFERENCE = {
    "overall_pick_rate": (115.97, 84.96, 133.92),
    "global_episode_return": (82.29, 57.5, 97.2),
    "total_deliveries": (80.53, 59, 93),
    "total_clashes": (170.77, 94, 642),
    "total_stuck": (19.30, 5, 110),
}

p = ArgumentParser()
p.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
p.add_argument("--episodes", type=int, default=30)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--replan_rejoin", action="store_true",
               help="measure the replan-rejoin throughput lever's "
                    "behavior distribution (config.py replan_rejoin)")
p.add_argument("--row_frac", type=float, default=None,
               help="override the batched-replan compaction budget "
                    "(config.py replan_row_frac) — parity-validate the "
                    "budget the rejoin sweep selects")
p.add_argument("--cpu", action="store_true",
               help="force the CPU backend (the axon sitecustomize "
                    "overrides JAX_PLATFORMS, so the env var is not "
                    "enough in this image)")

if __name__ == "__main__":
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.state import make_params
    from swarm_ode_tpu.policies import heuristic as H
    from swarm_ode_tpu.utils.metrics import pick_rate

    cfg = EnvConfig.from_env_id(args.env_id)
    if args.replan_rejoin or args.row_frac is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            replan_rejoin=args.replan_rejoin or cfg.replan_rejoin,
            replan_row_frac=(cfg.replan_row_frac if args.row_frac is None
                             else args.row_frac),
        )
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)
    steps = cfg.max_steps or 500
    B = args.episodes

    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, h = carry
            a, h = policy(params, es, h)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, h), (rew.sum(), info["shelf_deliveries"],
                             info["clashes"], info["stucks"])

        (es, h), out = jax.lax.scan(body, (es, h), None, length=steps)
        return tuple(o.sum() for o in out)

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(args.seed), B)
    ret, deliv, clash, stuck = map(np.asarray, run(keys))
    ours = {
        "overall_pick_rate": pick_rate(1, steps) * deliv,
        "global_episode_return": ret,
        "total_deliveries": deliv,
        "total_clashes": clash,
        "total_stuck": stuck,
    }
    print(f"{'metric':26s} {'reference mean (min-max)':>28s} {'ours mean (min-max)':>26s}")
    report = {}
    for k, (rm, rlo, rhi) in REFERENCE.items():
        v = ours[k].astype(np.float64)
        print(
            f"{k:26s} {rm:10.2f} ({rlo:.1f}-{rhi:.1f})"
            f"{'':6s}{v.mean():10.2f} ({v.min():.1f}-{v.max():.1f})"
        )
        report[k] = {
            "reference": {"mean": rm, "min": rlo, "max": rhi},
            "ours": {
                "mean": round(float(v.mean()), 2),
                "min": round(float(v.min()), 2),
                "max": round(float(v.max()), 2),
            },
        }
    print(json.dumps({"metric": "parity_medium_30ep", "detail": report}))
