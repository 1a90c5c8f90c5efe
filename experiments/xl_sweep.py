"""Extralarge throughput investigation (VERDICT r2 item 5): the 45x30 grid
is the worst scaling point (35k steps/s vs medium's 185k). Sweeps the
three levers that differ at this size — batch, replan sweep count, and
BFS kernel (bitpack packs only 2 queries/row here vs medium's 6) — and
reports steps/s plus the behavior stats so fidelity regressions show up
immediately.
"""
import argparse
import dataclasses
import itertools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--env",
                default="tarware-extralarge-19agvs-9pickers-partialobs-v1")
ap.add_argument("--batches", type=int, nargs="*", default=[512, 1024])
ap.add_argument("--iters", type=int, nargs="*", default=[0, 40],
                help="dynamic_bfs_iters overrides (0 = auto default)")
ap.add_argument("--kernels", nargs="*", default=["bitpack32"])
ap.add_argument("--replan", default="bfs", choices=["bfs", "off"],
                help="'off' measures the no-replanning ablation ceiling "
                     "(behavior drifts; throughput-roofline probe only)")
ap.add_argument("--steps", type=int, default=100)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    # Must run BEFORE importing swarm_ode_tpu: env/step.py creates jnp
    # constants at import, which initializes the default (axon) backend.
    jax.config.update("jax_platforms", "cpu")

from swarm_ode_tpu.config import EnvConfig  # noqa: E402
from swarm_ode_tpu.env import step as step_mod  # noqa: E402
from swarm_ode_tpu.env.layout import build_layout  # noqa: E402
from swarm_ode_tpu.env.state import make_params  # noqa: E402
from swarm_ode_tpu.policies import heuristic as H  # noqa: E402

for B, iters, kernel in itertools.product(
    args.batches, args.iters, args.kernels
):
    cfg = dataclasses.replace(
        EnvConfig.from_env_id(args.env),
        dynamic_bfs_iters=iters, bfs_kernel=kernel,
        replan_mode=args.replan,
    )
    lay = build_layout(cfg)
    params = make_params(cfg, lay)
    policy = H.make_policy(params, lay)

    def one(key):
        es = step_mod.reset(params, key)
        h = H.init_state(params)

        def body(carry, _):
            es, hs = carry
            a, hs = policy(params, es, hs)
            es, rew, done, info = step_mod.step(params, es, a)
            return (es, hs), (info["shelf_deliveries"], info["clashes"],
                              info["stucks"])

        (es, hs), out = jax.lax.scan(body, (es, h), None, length=args.steps)
        return tuple(o.sum() for o in out)

    try:
        run = jax.jit(jax.vmap(one))
        ks = jax.random.split(jax.random.PRNGKey(0), B)
        out = run(ks)
        jax.block_until_ready(out)
        t0 = time.time()
        out = run(jax.random.split(jax.random.PRNGKey(1), B))
        jax.block_until_ready(out)
        dt = time.time() - t0
        d, c, s = [np.asarray(o) for o in out]
        scale = 500 / args.steps
        print(
            f"B={B} iters={iters or params.dynamic_bfs_iters}"
            f"{'(auto)' if not iters else ''} kernel={kernel}: "
            f"{B * args.steps / dt:,.0f} steps/s | per-ep x{scale:.0f}: "
            f"deliveries {d.mean() * scale:.1f} clashes {c.mean() * scale:.1f}"
            f" stucks {s.mean() * scale:.1f}",
            flush=True,
        )
    except Exception as e:  # OOM at B=1024 is a finding, not a crash
        print(f"B={B} iters={iters} kernel={kernel}: FAILED {type(e).__name__}"
              f" {str(e)[:200]}", flush=True)
