"""Capture a TPU profile of the batched env step and print top HLO ops.

Usage: python experiments/profile_step.py [--replan_mode bfs] [--batch 1024]
Parses the xplane trace offline with xprof (no tensorboard server).
"""
from __future__ import annotations

import argparse
import glob
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env_id", default="tarware-medium-19agvs-9pickers-partialobs-v1")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--replan_mode", default="bfs")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/swarm_profile")
    args = ap.parse_args()

    from swarm_ode_tpu.config import EnvConfig
    from swarm_ode_tpu.env.layout import build_layout
    from swarm_ode_tpu.env.state import make_params
    from swarm_ode_tpu.env import step as step_mod
    from swarm_ode_tpu.policies import heuristic as H

    cfg = EnvConfig.from_env_id(args.env_id, replan_mode=args.replan_mode)
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

        (es, hs), (deliv, rew) = jax.lax.scan(body, (es, h), None, length=args.steps)
        return deliv.sum(), rew.sum()

    run = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), args.batch)
    out = run(keys)
    jax.block_until_ready(out)  # compile outside the trace

    import shutil

    shutil.rmtree(args.outdir, ignore_errors=True)
    with jax.profiler.trace(args.outdir):
        out = run(keys)
        jax.block_until_ready(out)

    xplanes = glob.glob(f"{args.outdir}/**/*.xplane.pb", recursive=True)
    print(f"# trace: {xplanes}")
    from xprof.convert import raw_to_tool_data as rtd

    # hlo_stats gives per-HLO self-times.
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    obj = json.loads(data)
    # gviz table format: {cols: [...], rows: [{c: [{v: ...}...]}]}
    cols = [c["label"] for c in obj["cols"]]
    rows = obj["rows"]

    def val(row, name):
        return row["c"][cols.index(name)]["v"]

    # Aggregate self-time by HLO category + op name prefix.
    from collections import defaultdict

    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    time_col = next(
        c for c in cols if "self" in c.lower() and "time" in c.lower()
    )
    cat_col = next(c for c in cols if "category" in c.lower())
    name_col = next(c for c in cols if "expression" in c.lower() or "name" in c.lower())
    for r in rows:
        t = float(val(r, time_col) or 0.0)
        total += t
        by_cat[val(r, cat_col)] += t
        nm = str(val(r, name_col))[:110]
        by_op[nm] += t

    print(f"\n== self time by category (total {total:,.0f} us) ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v:12,.0f} us  {100*v/total:5.1f}%  {k}")
    print(f"\n== top ops ==")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v:12,.0f} us  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
