"""Validate the scaled dynamic_bfs_iters auto default on larger layouts:
behavior stats (deliveries / clashes / stucks) at the auto sweep count vs
full H+W diameter coverage. Run: python experiments/bfs_iters_large.py"""
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


def run_stats(env_id, iters, B=192, T=300):
    cfg = EnvConfig.from_env_id(env_id, dynamic_bfs_iters=iters)
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
            return (es, hs), (
                info["shelf_deliveries"], info["clashes"], info["stucks"],
                info["replan_overflow"],
            )

        _, outs = jax.lax.scan(body, (es, h), None, length=T)
        return tuple(o.sum() for o in outs)

    run = jax.jit(jax.vmap(one))
    out = jax.block_until_ready(run(jax.random.split(jax.random.PRNGKey(0), B)))
    d, c, s, o = [np.asarray(v, np.float64) for v in out]
    scale = 500 / T
    print(
        f"{env_id} iters={iters or 'auto'}: deliveries/ep {d.mean()*scale:6.1f}"
        f"  clashes/ep {c.mean()*scale:6.1f}  stucks/ep {s.mean()*scale:5.2f}"
        f"  overflow {o.sum():.0f}  (eff_iters={params.dynamic_bfs_iters})"
    )
    return d.mean() * scale


if __name__ == "__main__":
    for env_id in [
        "tarware-large-19agvs-9pickers-partialobs-v1",
        "tarware-extralarge-19agvs-9pickers-partialobs-v1",
    ]:
        cfg = EnvConfig.from_env_id(env_id)
        lay = build_layout(cfg)
        Hh, Ww = lay.grid_size
        auto = run_stats(env_id, 0)
        full = run_stats(env_id, Hh + Ww)
        drift = abs(auto - full) / max(full, 1e-9)
        print(f"  -> auto vs diameter delivery drift: {100*drift:.2f}%\n")
